"""tpu_unet — a TPU-native (JAX/XLA/Pallas) segmentation framework with the
capabilities of the PyTorch U-Net reference (minghanz/pytorch-unet; see
SURVEY.md for the structural analysis and the empty-mount caveat in its §0).
"""

__version__ = "0.1.0"

from tpu_unet.models import UNetConfig, init_unet, param_count, unet_apply

__all__ = ["UNetConfig", "init_unet", "param_count", "unet_apply", "__version__"]
