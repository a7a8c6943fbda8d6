"""Device-side preprocessing: resize + normalize + mask indexing on the TPU.

North-star component (BASELINE.json: "the dataloader's image decode, resize,
normalize, and mask one-hot transforms fuse into a device-side preprocessing
pipeline feeding HBM with double-buffered prefetch"). The host only DECODES
(PIL → uint8 numpy); everything after — bicubic image resize, /255
normalization, nearest mask resize, palette→index mapping — is one jitted
XLA program on device, overlapped with the train step via
``prefetch_to_device``.

Parity notes (tested in tests/test_device_pipeline.py):
  * image resize: separable 4-tap Keys bicubic (a=−0.5), half-pixel centers
    — matches torch's F.interpolate(bicubic, align_corners=False) to fp32
    tolerance. PIL's BICUBIC additionally ANTIALIASES when downscaling, so
    device fast-mode is NOT bitwise-identical to the reference's host
    preprocess on downscale; the host path (data/loading.py) remains the
    parity-exact default and this pipeline is the opt-in fast path
    (--device-preprocess).
  * mask resize: NEAREST with PIL's center convention
    src = floor((i + 0.5)·in/out), bitwise-equal to PIL for these shapes;
    palette mapping by exact value match (scalar or RGB triples).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _cubic_grid(in_size: int, out_size: int, a: float = -0.75):
    """Static (idx [out,4], w [out,4]) for 4-tap Keys bicubic, half-pixel.

    Computed host-side in float64 (sizes are static) and baked into the jit
    as constants — fp32 grid math inside jit rounds differently from
    PIL/torch's double precision near integer boundaries. a=−0.75 is
    torch's bicubic coefficient.
    """
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(src)
    t = (src - base)[:, None]
    offs = np.asarray([-1.0, 0.0, 1.0, 2.0])[None, :]
    x = np.abs(t - offs)
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        np.where(x < 2.0, a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    idx = np.clip(base[:, None].astype(np.int64) + np.asarray([-1, 0, 1, 2])[None, :], 0, in_size - 1)
    return jnp.asarray(idx, jnp.int32), jnp.asarray(w, jnp.float32)


def _resize_axis_cubic(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    in_size = x.shape[axis]
    idx, w = _cubic_grid(in_size, out_size)
    gathered = jnp.take(x, idx.reshape(-1), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis : axis + 1] = [out_size, 4]
    gathered = gathered.reshape(new_shape)
    wshape = [1] * gathered.ndim
    wshape[axis], wshape[axis + 1] = out_size, 4
    return jnp.sum(gathered * w.reshape(wshape), axis=axis + 1)


def _nearest_indices(in_size: int, out_size: int) -> jnp.ndarray:
    # PIL NEAREST center convention: src = floor((i + 0.5) * in/out),
    # computed host-side in float64 (see _cubic_grid note).
    idx = np.floor(
        (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size)
    ).astype(np.int64)
    return jnp.asarray(np.clip(idx, 0, in_size - 1), jnp.int32)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def device_preprocess_images(images_u8: jax.Array, *, out_h: int, out_w: int) -> jax.Array:
    """uint8 [N,H,W,C] → float32 [N,out_h,out_w,C] in [0,1], bicubic."""
    x = images_u8.astype(jnp.float32)
    x = _resize_axis_cubic(x, out_h, axis=1)
    x = _resize_axis_cubic(x, out_w, axis=2)
    return x / 255.0


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def device_preprocess_masks(
    masks_raw: jax.Array, mask_values: jax.Array, *, out_h: int, out_w: int
) -> jax.Array:
    """Raw masks [N,H,W] (or [N,H,W,3]) → int32 class indices [N,out_h,out_w].

    NEAREST resize first (PIL convention), then exact palette matching
    against ``mask_values`` ([K] scalars or [K,3] RGB rows).
    """
    ry = _nearest_indices(masks_raw.shape[1], out_h)
    rx = _nearest_indices(masks_raw.shape[2], out_w)
    m = jnp.take(jnp.take(masks_raw, ry, axis=1), rx, axis=2)
    if masks_raw.ndim == 4:  # RGB triples
        eq = jnp.all(
            m[..., None, :] == mask_values[None, None, None, :, :], axis=-1
        )  # [N,h,w,K]
    else:
        eq = m[..., None] == mask_values[None, None, None, :]
    return jnp.argmax(eq, axis=-1).astype(jnp.int32)


class DevicePipeline:
    """Wraps a raw-decode dataset: host PIL decode → device resize/normalize.

    ``dataset`` must yield dicts with raw uint8 arrays (see RawDataset); this
    object is an iterable of device-resident preprocessed batches.
    """

    def __init__(self, loader, mask_values, scale: float, raw_h: int, raw_w: int):
        self.loader = loader
        self.mask_values = jnp.asarray(mask_values)
        self.out_h, self.out_w = int(raw_h * scale), int(raw_w * scale)
        assert self.out_h > 0 and self.out_w > 0, "Scale is too small"

    def __iter__(self):
        for batch in self.loader:
            imgs = device_preprocess_images(
                jnp.asarray(batch["image"]), out_h=self.out_h, out_w=self.out_w
            )
            masks = device_preprocess_masks(
                jnp.asarray(batch["mask"]), self.mask_values,
                out_h=self.out_h, out_w=self.out_w,
            )
            yield {"image": imgs, "mask": masks}

    def __len__(self):
        return len(self.loader)
