"""Bilinear resize ops with exact torch semantics.

Two distinct interpolation conventions appear in the reference and BOTH are
parity-critical (SURVEY.md §7 "hard part #1"):

  1. ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
     inside the decoder Up blocks (reference: unet/unet_parts.py — Up,
     UNVERIFIED). align_corners=True maps src = dst*(in-1)/(out-1).
     XLA's ``jax.image.resize`` is half-pixel (align_corners=False), so we
     build the align-corners gather ourselves.

  2. ``F.interpolate(output, (H, W), mode='bilinear')`` (align_corners=False,
     half-pixel) used by predict_img to upscale logits back to the original
     resolution (reference: predict.py — predict_img, UNVERIFIED, SURVEY.md
     §3.2).

Both are implemented as two separable 1-D gathers+lerps with statically
computed indices/weights — static shapes, no data-dependent control flow, so
XLA fuses them into neighbouring ops. For the common 2× align-corners upsample
the gather degenerates to stride-friendly slicing XLA handles well.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _axis_indices_weights(in_size: int, out_size: int, align_corners: bool):
    """Static (lo, hi, w_hi) arrays for 1-D linear interpolation."""
    if out_size == 1:
        src = np.zeros((1,), np.float64)
    elif align_corners:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w_hi)


def resize_bilinear(
    x: jax.Array, out_h: int, out_w: int, *, align_corners: bool
) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) tensor to (out_h, out_w)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    if h != out_h:
        lo, hi, wt = _axis_indices_weights(h, out_h, align_corners)
        top = jnp.take(xf, lo, axis=1)
        bot = jnp.take(xf, hi, axis=1)
        xf = top + (bot - top) * wt[None, :, None, None]
    if w != out_w:
        lo, hi, wt = _axis_indices_weights(w, out_w, align_corners)
        left = jnp.take(xf, lo, axis=2)
        right = jnp.take(xf, hi, axis=2)
        xf = left + (right - left) * wt[None, None, :, None]

    out = xf.astype(orig_dtype)
    return out[0] if squeeze else out


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """2× bilinear upsample, align_corners=True — the decoder's Up path."""
    return resize_bilinear(x, 2 * x.shape[-3], 2 * x.shape[-2], align_corners=True)
