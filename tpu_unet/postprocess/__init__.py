from tpu_unet.postprocess.crf import crf_refine, crf_refine_binary

__all__ = ["crf_refine", "crf_refine_binary"]
