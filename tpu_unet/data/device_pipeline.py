"""Device-side preprocessing: PIL-bit-exact resize + normalize on the TPU.

North-star component (BASELINE.json: "the dataloader's image decode, resize,
normalize, and mask one-hot transforms fuse into a device-side preprocessing
pipeline feeding HBM with double-buffered prefetch"). The host only DECODES
(PIL/native → uint8 numpy); everything after — antialiased bicubic image
resize, /255 normalization, nearest mask resize, palette→index mapping — is
one jitted XLA program on device, overlapped with the train step via
``prefetch_to_device``.

Parity (tested bit-exact in tests/test_device_pipeline.py):
  * image resize reproduces Pillow's convolution resampling EXACTLY —
    the same semantics the native host tier implements in C++
    (tpu_unet/native/preproc.cc): per-output-pixel windows from
    ``precompute_coeffs`` (float64, host-side, baked into the jit as
    constants), coefficients quantized to INT32 fixed point at
    PRECISION_BITS=22, horizontal-then-vertical passes with a clip8-
    quantized uint8 intermediate, antialiasing via the filterscale-widened
    support on downscale. The device passes run in int32 (fp32 cannot hold
    the ~2^30 fixed-point products exactly; the TPU's vector unit can), so
    ``--device-preprocess`` is BIT-IDENTICAL to the reference's host
    preprocess (reference: utils/data_loading.py ~L55, UNVERIFIED mount,
    SURVEY.md §2 #9) — not an approximation.
  * mask resize: NEAREST with Pillow's ACCUMULATED source coordinate
    (``xo += scale`` per output pixel, ImagingScaleAffine) — the
    double-rounding drift differs from direct multiplication exactly on
    boundary-landing columns — with Pillow's fill value 0 for the
    (drift-only) out-of-range indices; then exact palette matching.
  * /255 iff max > 1, per image — the reference's conditional, evaluated
    on device.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# Pillow Resample.c fixed-point precision for 8-bit channels.
_PRECISION_BITS = 32 - 8 - 2  # 22


def _bicubic_filter(x: np.ndarray) -> np.ndarray:
    # Keys cubic, a = -0.5 (Pillow's BICUBIC), float64.
    a = -0.5
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


def _bilinear_filter(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


_FILTERS = {"bicubic": (_bicubic_filter, 2.0), "bilinear": (_bilinear_filter, 1.0)}


@functools.lru_cache(maxsize=64)
def _pil_coeffs(in_size: int, out_size: int, filter: str = "bicubic"):
    """Pillow's precompute_coeffs + normalize_coeffs_8bpc, host-side float64.

    Returns (idx [out, ksize] int32 clipped gather indices, kk [out, ksize]
    int32 fixed-point coefficients at 2^22). Weights outside each output
    pixel's [xmin, xmin+xmax) window are exactly 0, so clamping their gather
    indices into range is harmless. Mirrors tpu_unet/native/preproc.cc
    (itself Pillow Resample.c) including the C int truncations.
    """
    f, support0 = _FILTERS[filter]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1
    ss = 1.0 / filterscale

    idx = np.zeros((out_size, ksize), np.int64)
    kk = np.zeros((out_size, ksize), np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)  # C trunc-toward-zero, then clamp
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        xmax -= xmin
        taps = np.arange(xmax, dtype=np.float64)
        w = f((taps + xmin - center + 0.5) * ss)
        total = w.sum()
        if total != 0.0:
            w = w / total
        kk[xx, :xmax] = w
        idx[xx] = np.minimum(xmin + np.arange(ksize), in_size - 1)
    # INT32 fixed point with Pillow's round-half-away (trunc of v ± 0.5).
    # Cached as PLAIN NUMPY: returning jnp arrays from an lru_cache leaks
    # constant tracers across jit traces (UnexpectedTracerError on the
    # second trace at a new batch shape).
    v = kk * (1 << _PRECISION_BITS)
    kk_i32 = np.where(v < 0, v - 0.5, v + 0.5).astype(np.int32)
    return idx.astype(np.int32), kk_i32


def _clip8(acc: jax.Array) -> jax.Array:
    # Pillow clip8: >= 1<<(22+8) → 255; <= 0 → 0; else >> 22.
    return jnp.where(
        acc >= (1 << (_PRECISION_BITS + 8)),
        255,
        jnp.where(acc <= 0, 0, jnp.right_shift(acc, _PRECISION_BITS)),
    )


def _resample_axis_pil(x: jax.Array, out_size: int, axis: int,
                       filter: str = "bicubic") -> jax.Array:
    """One Pillow resampling pass along ``axis`` (int32 in, int32 0..255 out).

    Identity sizes are a copy (Pillow skips the pass entirely — no
    quantization happens, so neither do we).
    """
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    idx, kk = _pil_coeffs(in_size, out_size, filter)
    ksize = idx.shape[1]
    wshape = [1] * x.ndim
    wshape[axis] = out_size
    out_shape = list(x.shape)
    out_shape[axis] = out_size
    acc = jnp.full(out_shape, 1 << (_PRECISION_BITS - 1), jnp.int32)
    for t in range(ksize):  # static unroll: ksize gathers + int32 FMAs
        acc = acc + jnp.take(x, idx[:, t], axis=axis) * kk[:, t].reshape(wshape)
    return _clip8(acc)


def device_resample_u8(x: jax.Array, *, out_h: int, out_w: int,
                       filter: str = "bicubic") -> jax.Array:
    """Pillow-bit-exact resize of uint8 [N,H,W,C] → int32 0..255 [N,h,w,C].

    Horizontal pass first, then vertical, clip8-quantizing between — the
    exact pass structure of Pillow's ImagingResample (and of our native C++
    twin, which tests/test_device_pipeline.py cross-checks all three ways).
    """
    x = x.astype(jnp.int32)
    x = _resample_axis_pil(x, out_w, axis=2, filter=filter)
    x = _resample_axis_pil(x, out_h, axis=1, filter=filter)
    return x


@functools.lru_cache(maxsize=64)
def _pil_nearest_indices(in_size: int, out_size: int):
    """Pillow NEAREST source indices via the ACCUMULATED affine coordinate.

    ImagingScaleAffine walks ``xo += scale`` instead of multiplying, and the
    float64 drift lands differently on boundary columns — bit-parity
    requires the same walk. Returns (clamped idx [out] int32, oob [out]
    bool); out-of-range pixels (reachable only via drift) take Pillow's
    fill value 0.
    """
    scale = in_size / out_size
    xo = scale * 0.5
    idx = np.zeros(out_size, np.int64)
    for i in range(out_size):
        idx[i] = -1 if xo < 0 else int(xo)
        xo += scale
    oob = (idx < 0) | (idx >= in_size)
    # Plain numpy (see _pil_coeffs): jnp constants must not be lru_cached.
    return np.clip(idx, 0, in_size - 1).astype(np.int32), oob


def raw_u8_for_device(img) -> np.ndarray | None:
    """Decoded uint8 HWC array if ``img`` is eligible for the device
    preprocess path, else None (caller falls back to host PIL preprocess).

    Eligible = 8-bit samples AND a mode Pillow resamples per-band with no
    value transform — an ALLOWLIST of 'L' and 'RGB'. Everything else
    diverges from the host path in some way: palette ('P') and bilevel
    ('1') decode to indices/bits and get NEAREST-coerced; alpha modes
    ('LA'/'RGBA'/'PA') are alpha-PREMULTIPLIED by Pillow before
    convolution (measured 0.2-0.3 divergence on the 0-1 scale, code-review
    r3); 16/32-bit ('I'/'F') violate the u8 fixed-point contract. Shared
    by both inference surfaces so the fallback policy is single-sourced."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8 or getattr(img, "mode", None) not in ("L", "RGB"):
        return None
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def device_preprocess_images(images_u8: jax.Array, *, out_h: int, out_w: int) -> jax.Array:
    """uint8 [N,H,W,C] → float32 [N,out_h,out_w,C], PIL-BICUBIC bit-exact.

    Matches BasicDataset.preprocess (host) bitwise: same resampled uint8
    pixels, then the reference's per-image ``/255 iff max > 1`` rule. The
    division goes through a 256-entry fp32 table precomputed by numpy —
    XLA rewrites ``x / 255.0`` into ``x * (1/255)`` which is 1 ULP off
    numpy's correctly-rounded divide; a gather of exact constants isn't.
    """
    x = device_resample_u8(images_u8, out_h=out_h, out_w=out_w)  # int32 0..255
    maxes = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    div_table = jnp.asarray(np.arange(256, dtype=np.float32) / np.float32(255.0))
    return jnp.where(maxes > 1, jnp.take(div_table, x), x.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def device_preprocess_masks(
    masks_raw: jax.Array, mask_values: jax.Array, *, out_h: int, out_w: int
) -> jax.Array:
    """Raw masks [N,H,W] (or [N,H,W,3]) → int32 class indices [N,out_h,out_w].

    NEAREST resize first (Pillow's accumulated-coordinate convention, fill
    0), then exact palette matching against ``mask_values`` ([K] scalars or
    [K,3] RGB rows).
    """
    ry, oob_y = _pil_nearest_indices(masks_raw.shape[1], out_h)
    rx, oob_x = _pil_nearest_indices(masks_raw.shape[2], out_w)
    m = jnp.take(jnp.take(masks_raw, ry, axis=1), rx, axis=2)
    oob = oob_y[:, None] | oob_x[None, :]
    if masks_raw.ndim == 4:  # RGB triples
        m = jnp.where(oob[None, :, :, None], 0, m)
        eq = jnp.all(
            m[..., None, :] == mask_values[None, None, None, :, :], axis=-1
        )  # [N,h,w,K]
    else:
        m = jnp.where(oob[None, :, :], 0, m)
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
