"""Inference driver + CLI, mirroring the reference's predict surface.

Parity targets (reference: predict.py — predict_img, get_args, mask_to_image,
__main__; UNVERIFIED mount, SURVEY.md §2 #17–#18, §3.2):

  * predict_img: shared BasicDataset.preprocess → forward → bilinear
    (half-pixel) upscale of LOGITS back to the ORIGINAL resolution → only
    then threshold (sigmoid > out_threshold) or argmax. The order matters
    for mask parity and is reproduced exactly.
  * CLI: --model/-m, --input/-i (nargs+), --output/-o, --viz/-v,
    --no-save/-n, --mask-threshold/-t 0.5, --scale/-s 0.5, --bilinear,
    --classes/-c; outputs default to ``<input>_OUT.png``.
  * mask_to_image maps class indices through the checkpoint's mask_values
    palette (the quirky-but-load-bearing contract, SURVEY.md §5).

TPU-native: forward+upscale+threshold is one jitted program per input shape;
for large inputs, tiled sliding-window inference with halo stitching lives in
tpu_unet/parallel/tiling.py (--tile to opt in).
"""

from __future__ import annotations

import argparse
import functools
import logging
import os
from pathlib import Path

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from tpu_unet.checkpoint import import_pth, load_checkpoint
from tpu_unet.data.loading import BasicDataset
from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.ops import resize_bilinear

logger = logging.getLogger(__name__)


@functools.partial(jax.jit,
                   static_argnames=("config", "full_h", "full_w", "amp",
                                    "tta", "tta_mode"))
def _forward_full(params, state, x, *, config: UNetConfig, full_h: int,
                  full_w: int, amp: bool = False, tta: bool = False,
                  tta_mode: str = "flips"):
    """Eval forward; ``tta`` flip-ensembles the four views as ONE batched
    program (models/tta.py). Merged or plain, the logits then follow the
    exact reference order (upscale → threshold), so --tta composes with
    everything downstream."""
    compute_dtype = jnp.bfloat16 if amp else None
    if tta:
        from tpu_unet.models.tta import tta_logits

        logits = tta_logits(params, state, x, config=config,
                            compute_dtype=compute_dtype, mode=tta_mode)
    else:
        logits, _ = unet_apply(
            params, state, x, config=config, train=False,
            compute_dtype=compute_dtype,
        )
    # Upscale LOGITS to the original size first (reference order, §3.2).
    return resize_bilinear(logits, full_h, full_w, align_corners=False)


def predict_img(
    params,
    state,
    config: UNetConfig,
    full_img: Image.Image,
    scale_factor: float = 0.5,
    out_threshold: float = 0.5,
    amp: bool = False,
    use_crf: bool = False,
    tta: bool = False,
    tta_mode: str = "flips",
    device_preprocess: bool = False,
) -> np.ndarray:
    """Predict a mask for one PIL image at its ORIGINAL resolution.

    use_crf applies mean-field CRF refinement to the probabilities before
    thresholding (legacy-reference utils/crf.py capability, SURVEY.md §A.1).
    tta averages logits over the four flip views (models/tta.py) before the
    reference's upscale→threshold pipeline. device_preprocess moves the
    resize + /255 onto the device (Pillow-bit-exact int32 resample,
    data/device_pipeline.py) — identical mask, host cost = decode only;
    non-8-bit inputs fall back to the host path.
    """
    x = None
    if device_preprocess:
        from tpu_unet.data.device_pipeline import (
            device_preprocess_images,
            raw_u8_for_device,
        )

        arr = raw_u8_for_device(full_img)
        if arr is not None:
            new_h, new_w = (int(scale_factor * arr.shape[0]),
                            int(scale_factor * arr.shape[1]))
            assert new_h > 0 and new_w > 0, \
                "Scale is too small, resized images would have no pixel"
            x = device_preprocess_images(jnp.asarray(arr)[None],
                                         out_h=new_h, out_w=new_w)
        else:
            logger.warning("image not device-preprocessable (mode %s): "
                           "falling back to host preprocess",
                           getattr(full_img, "mode", "?"))
    if x is None:
        img = BasicDataset.preprocess(None, full_img, scale_factor, is_mask=False)
        x = jnp.asarray(img)[None]  # [1,H,W,C]
    full_w, full_h = full_img.size
    logits = _forward_full(
        params, state, x, config=config, full_h=full_h, full_w=full_w,
        amp=amp, tta=tta, tta_mode=tta_mode,
    )
    if config.n_classes > 1:
        if use_crf:
            from tpu_unet.postprocess import crf_refine

            rgb = jnp.asarray(
                BasicDataset.preprocess(None, full_img, 1.0, is_mask=False)
            )[None]
            probs = crf_refine(rgb, jax.nn.softmax(logits, axis=-1))
            return np.asarray(jnp.argmax(probs, axis=-1)[0])
        return np.asarray(jnp.argmax(logits, axis=-1)[0])
    else:
        probs = jax.nn.sigmoid(logits[0, ..., 0])
        if use_crf:
            from tpu_unet.postprocess import crf_refine_binary

            rgb = jnp.asarray(
                BasicDataset.preprocess(None, full_img, 1.0, is_mask=False)
            )[None]
            probs = crf_refine_binary(rgb, probs[None])[0]
        return np.asarray(probs > out_threshold)


def _threshold_batch(logits, config: UNetConfig, out_threshold: float):
    """Reference order, per batch row: logits (already upscaled) → mask."""
    if config.n_classes > 1:
        return np.asarray(jnp.argmax(logits, axis=-1))
    return np.asarray(jax.nn.sigmoid(logits[..., 0]) > out_threshold)


def iter_predicted_masks(
    params,
    state,
    config: UNetConfig,
    filenames,
    *,
    scale_factor: float = 0.5,
    out_threshold: float = 0.5,
    amp: bool = False,
    tta: bool = False,
    tta_mode: str = "flips",
    batch_size: int = 1,
    device_preprocess: bool = False,
):
    """Yield ``(filename, PIL image, mask)`` in input order, forwarding up to
    ``batch_size`` same-shaped images as ONE batched program.

    Beyond-reference throughput lever for the CLI's nargs+ input list (the
    reference predicts strictly one image per forward — SURVEY.md §3.2;
    submit.py already batches at test-set scale): consecutive inputs that
    share a preprocessed shape AND original size ride the same jitted
    forward, so a Carvana-style homogeneous directory runs at batch
    efficiency. A shape change or the batch filling flushes the group —
    memory stays bounded at ``batch_size`` images and output order is the
    input order exactly. Per-row threshold/argmax preserves the reference's
    upscale→threshold order (it happens after the batched upscale).
    """
    pending: list[tuple[str, Image.Image, np.ndarray]] = []
    key = None  # (is-raw-u8, array shape, original PIL size)

    def flush():
        nonlocal pending, key
        if not pending:
            return
        raw = key[0]
        x = jnp.asarray(np.stack([arr for _, _, arr in pending]))
        if raw:
            from tpu_unet.data.device_pipeline import device_preprocess_images

            new_h = int(scale_factor * x.shape[1])
            new_w = int(scale_factor * x.shape[2])
            assert new_h > 0 and new_w > 0, \
                "Scale is too small, resized images would have no pixel"
            x = device_preprocess_images(x, out_h=new_h, out_w=new_w)
        full_w, full_h = pending[0][1].size
        logits = _forward_full(
            params, state, x, config=config, full_h=full_h, full_w=full_w,
            amp=amp, tta=tta, tta_mode=tta_mode,
        )
        masks = _threshold_batch(logits, config, out_threshold)
        done, pending, key = pending, [], None
        for (fname, img, _), mask in zip(done, masks):
            yield fname, img, mask

    for filename in filenames:
        img = Image.open(filename)
        arr = None
        raw = False
        if device_preprocess:
            from tpu_unet.data.device_pipeline import raw_u8_for_device

            arr = raw_u8_for_device(img)
            raw = arr is not None
            if not raw:
                logger.warning(
                    "image %s not device-preprocessable (mode %s): "
                    "falling back to host preprocess", filename,
                    getattr(img, "mode", "?"))
        if arr is None:
            arr = BasicDataset.preprocess(None, img, scale_factor,
                                          is_mask=False)
        k = (raw, arr.shape, img.size)
        if key is not None and k != key:
            yield from flush()
        key = k
        pending.append((filename, img, arr))
        if len(pending) >= batch_size:
            yield from flush()
    yield from flush()


def predict_img_fused(
    params,
    state,
    config: UNetConfig,
    full_img: Image.Image,
    *,
    backend: str = "xla",
    scale_factor: float = 0.5,
    out_threshold: float = 0.5,
    amp: bool = False,
) -> np.ndarray:
    """predict_img through the folded-BN fused inference path (models/infer.py)."""
    from tpu_unet.models.infer import fold_bn, unet_infer_apply

    img = BasicDataset.preprocess(None, full_img, scale_factor, is_mask=False)
    x = jnp.asarray(img)[None]
    folded = fold_bn(params, state, config)
    logits = unet_infer_apply(
        folded, x, config=config, backend=backend,
        compute_dtype=jnp.bfloat16 if amp else None,
    )
    full_w, full_h = full_img.size
    logits = resize_bilinear(logits, full_h, full_w, align_corners=False)
    if config.n_classes > 1:
        return np.asarray(jnp.argmax(logits, axis=-1)[0])
    return np.asarray(jax.nn.sigmoid(logits[0, ..., 0]) > out_threshold)


def predict_img_halo_sharded(
    params,
    state,
    config: UNetConfig,
    full_img: Image.Image,
    *,
    scale_factor: float = 0.5,
    out_threshold: float = 0.5,
    amp: bool = False,
    tta: bool = False,
    tta_mode: str = "flips",
) -> np.ndarray:
    """predict_img with the image sharded in horizontal bands across ALL
    devices, halos exchanged over ICI (parallel/tiling.py). Falls back to the
    single-device forward when constraints don't hold (one device, unaligned
    size, or bands too short for the halo). ``tta`` rides as batch rows of
    the same sharded program (flip views don't change H/W alignment)."""
    from tpu_unet.parallel.mesh import make_mesh
    from tpu_unet.parallel.tiling import make_halo_sharded_forward, min_halo

    img = BasicDataset.preprocess(None, full_img, scale_factor, is_mask=False)
    x = jnp.asarray(img)[None]
    h, w = x.shape[1], x.shape[2]
    d = jax.device_count()
    band = h // d if d else 0
    full_w, full_h = full_img.size
    halo = min_halo(config)  # arch-aware (r2u's RF outgrows the default 128)
    if d < 2 or h % (16 * d) or w % 16 or band < 2 * halo:
        logger.warning(
            "halo-sharded constraints not met (devices=%d, H=%d, W=%d) — "
            "falling back to single-device forward", d, h, w,
        )
        logits = _forward_full(
            params, state, x, config=config, full_h=full_h, full_w=full_w,
            amp=amp, tta=tta, tta_mode=tta_mode,
        )
    else:
        mesh = make_mesh(axis="spatial")
        fwd = make_halo_sharded_forward(mesh, config, halo=halo, amp=amp)
        if tta:
            from tpu_unet.models.tta import tta_merge, tta_views

            logits = tta_merge(fwd(params, state, tta_views(x, tta_mode)), 1,
                               tta_mode)
        else:
            logits = fwd(params, state, x)
        logits = resize_bilinear(logits, full_h, full_w, align_corners=False)
    if config.n_classes > 1:
        return np.asarray(jnp.argmax(logits, axis=-1)[0])
    return np.asarray(jax.nn.sigmoid(logits[0, ..., 0]) > out_threshold)


def mask_to_image(mask: np.ndarray, mask_values) -> Image.Image:
    """Map class indices back through the stored palette (reference parity)."""
    if isinstance(mask_values[0], list):
        out = np.zeros((mask.shape[-2], mask.shape[-1], len(mask_values[0])), dtype=np.uint8)
    elif mask_values == [0, 1]:
        out = np.zeros((mask.shape[-2], mask.shape[-1]), dtype=bool)
    else:
        out = np.zeros((mask.shape[-2], mask.shape[-1]), dtype=np.uint8)

    if mask.ndim == 3:  # one-hot [C,H,W] → indices
        mask = np.argmax(mask, axis=0)

    for i, v in enumerate(mask_values):
        out[mask == i] = v
    return Image.fromarray(out)


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Predict masks from input images")
    parser.add_argument("--model", "-m", default="MODEL.npz", metavar="FILE",
                        help="Specify the file in which the model is stored (.npz or torch .pth)")
    parser.add_argument("--input", "-i", metavar="INPUT", nargs="+", required=True,
                        help="Filenames of input images")
    parser.add_argument("--output", "-o", metavar="OUTPUT", nargs="+", help="Filenames of output images")
    parser.add_argument("--viz", "-v", action="store_true",
                        help="Visualize the images as they are processed")
    parser.add_argument("--no-save", "-n", action="store_true", help="Do not save the output masks")
    parser.add_argument("--mask-threshold", "-t", type=float, default=0.5,
                        help="Minimum probability value to consider a mask pixel white")
    parser.add_argument("--scale", "-s", type=float, default=0.5,
                        help="Scale factor for the input images")
    parser.add_argument("--bilinear", action="store_true", default=False, help="Use bilinear upsampling")
    parser.add_argument("--classes", "-c", type=int, default=1, help="Number of classes")
    # TPU-framework extensions:
    parser.add_argument("--amp", action="store_true", default=False, help="bf16 inference")
    parser.add_argument("--tile", type=int, default=None,
                        help="Tiled sliding-window inference with this tile size (large images)")
    parser.add_argument("--tile-sharded", action="store_true", default=False,
                        help="Shard image bands across all devices with ICI halo "
                             "exchange (large images, multi-chip)")
    parser.add_argument("--arch", choices=["unet", "unetpp", "attention", "r2u", "r2attu"], default="unet",
                        help="Model family the checkpoint was trained with")
    parser.add_argument("--crf", action="store_true", default=False,
                        help="Mean-field CRF refinement of the probabilities "
                             "(legacy-reference utils/crf.py capability)")
    parser.add_argument("--batch-size", type=int, default=1, metavar="N",
                        help="Forward up to N same-shaped inputs as one "
                             "batched program (throughput for homogeneous "
                             "input lists; output order and masks unchanged)")
    parser.add_argument("--tta", action="store_true", default=False,
                        help="Test-time augmentation: average logits over "
                             "flip views (one batched forward) before "
                             "thresholding")
    parser.add_argument("--tta-mode", choices=["flips", "hflip"],
                        default="flips",
                        help="TTA view set: all four flips, or identity+"
                             "left-right only (scenes with a gravity axis "
                             "— vertical flips are out-of-distribution)")
    parser.add_argument("--kernels", choices=["xla", "pallas"], default=None,
                        help="Fold BN and run the fused inference path with this backend "
                             "(default: the reference-parity train-graph forward)")
    parser.add_argument("--device-preprocess", action="store_true", default=False,
                        help="Resize + normalize on device (Pillow-bit-exact "
                             "int32 resample — identical mask; host keeps "
                             "only the decode)")
    return parser.parse_args(argv)


def get_output_filenames(args):
    def _generate_name(fn):
        return f"{os.path.splitext(fn)[0]}_OUT.png"

    return args.output or list(map(_generate_name, args.input))


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    in_files = args.input
    out_files = get_output_filenames(args)
    if args.tta and args.kernels:
        # The folded-kernel path has its own forward; keep --tta explicit
        # rather than silently ignored there. (--tile/--tile-sharded DO
        # compose: the flip views ride as batch rows of the same sweep.)
        raise SystemExit("--tta does not compose with --kernels")
    if args.device_preprocess and (args.tile or args.tile_sharded or args.kernels):
        # Those variants host-preprocess inside their own drivers; reject
        # rather than silently ignore the flag.
        raise SystemExit("--device-preprocess applies to the default "
                         "predict path (not --tile/--tile-sharded/--kernels)")

    config = UNetConfig(
        n_channels=3, n_classes=args.classes, bilinear=args.bilinear, arch=args.arch
    )
    logger.info("Loading model %s", args.model)
    if str(args.model).endswith(".pth"):
        params, state, mask_values = import_pth(args.model, config)
    else:
        from tpu_unet.checkpoint import read_checkpoint_meta

        _, extra = read_checkpoint_meta(args.model)
        if "config" in extra:
            # Self-describing checkpoint: its stored config wins over the
            # CLI defaults (so e.g. a --deep-supervision UNet++ checkpoint
            # loads without re-specifying every flag).
            config = UNetConfig(**extra["config"])
        params, state = init_unet(jax.random.PRNGKey(0), config)
        params, state, mask_values, _ = load_checkpoint(args.model, params, state)
    if mask_values is None:
        # Fall back on the CHECKPOINT-derived class count: a self-describing
        # .npz may override the CLI's --classes above, and a palette sized
        # by the stale CLI value would silently zero the extra classes.
        mask_values = ([0, 1] if config.n_classes == 1
                       else list(range(config.n_classes)))
    logger.info("Model loaded!")

    if args.batch_size > 1:
        if args.tile or args.tile_sharded or args.kernels or args.crf:
            # Those paths drive their own per-image programs; refuse rather
            # than silently run them un-batched.
            raise SystemExit("--batch-size composes with the default "
                             "predict path only (not --tile/--tile-sharded/"
                             "--kernels/--crf)")
        produced = iter_predicted_masks(
            params, state, config, in_files,
            scale_factor=args.scale, out_threshold=args.mask_threshold,
            amp=args.amp, tta=args.tta, tta_mode=args.tta_mode,
            batch_size=args.batch_size,
            device_preprocess=args.device_preprocess,
        )
        for i, (filename, img, mask) in enumerate(produced):
            logger.info("Predicted image %s", filename)
            if not args.no_save:
                result = mask_to_image(mask, mask_values)
                result.save(out_files[i])
                logger.info("Mask saved to %s", out_files[i])
            if args.viz:
                from tpu_unet.utils.viz import plot_img_and_mask

                plot_img_and_mask(img, mask)
        return

    for i, filename in enumerate(in_files):
        logger.info("Predicting image %s ...", filename)
        img = Image.open(filename)

        if args.tile_sharded:
            mask = predict_img_halo_sharded(
                params, state, config, img,
                scale_factor=args.scale, out_threshold=args.mask_threshold,
                amp=args.amp, tta=args.tta, tta_mode=args.tta_mode,
            )
        elif args.tile:
            from tpu_unet.parallel.tiling import predict_img_tiled

            mask = predict_img_tiled(
                params, state, config, img,
                tile=args.tile, scale_factor=args.scale,
                out_threshold=args.mask_threshold, amp=args.amp,
                tta=args.tta, tta_mode=args.tta_mode,
            )
        elif args.kernels:
            mask = predict_img_fused(
                params, state, config, img, backend=args.kernels,
                scale_factor=args.scale, out_threshold=args.mask_threshold, amp=args.amp,
            )
        else:
            mask = predict_img(
                params, state, config, img,
                scale_factor=args.scale, out_threshold=args.mask_threshold,
                amp=args.amp, use_crf=args.crf, tta=args.tta,
                tta_mode=args.tta_mode,
                device_preprocess=args.device_preprocess,
            )

        if not args.no_save:
            out_filename = out_files[i]
            result = mask_to_image(mask, mask_values)
            result.save(out_filename)
            logger.info("Mask saved to %s", out_filename)

        if args.viz:
            from tpu_unet.utils.viz import plot_img_and_mask

            logger.info("Visualizing results for image %s, close to continue...", filename)
            plot_img_and_mask(img, mask)


if __name__ == "__main__":
    main()
