"""Convolution ops, NHWC-native for TPU.

TPU-first design notes
----------------------
All convolutions use NHWC activations and HWIO kernels — the layouts XLA:TPU
tiles directly onto the MXU without relayout copies (channels ride the 128-wide
lane dimension). The reference's effective compute tier is torch/cuDNN NCHW
``Conv2d``/``ConvTranspose2d`` (reference: unet/unet_parts.py — DoubleConv/Up,
UNVERIFIED mount, see SURVEY.md §0); here they are thin, jit-friendly wrappers
over ``lax.conv_general_dilated`` so XLA owns fusion and tiling.

Semantics parity (tested against torch-CPU in tests/test_ops.py):
  * conv2d ≡ torch.nn.functional.conv2d (cross-correlation, zero padding)
  * conv_transpose2d ≡ torch.nn.functional.conv_transpose2d, expressed as a
    fractionally-strided conv (lhs_dilation) with a spatially-flipped kernel —
    the form XLA:TPU pipelines best (no scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels: the canonical TPU layouts.
DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    preferred_dtype: jnp.dtype | None = jnp.float32,
) -> jax.Array:
    """2-D convolution. x: [N,H,W,Cin], w: [kH,kW,Cin,Cout] -> [N,H',W',Cout].

    Matches torch.nn.functional.conv2d (bias-free; add bias separately so XLA
    fuses it into the conv epilogue).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=_preferred(x, preferred_dtype),
    )


def _preferred(x, preferred_dtype):
    """fp32 accumulation hint for fp32 inputs only. For bf16 inputs the MXU
    accumulates in fp32 in hardware regardless, and requesting an fp32 OUTPUT
    would make autodiff's transpose rule pair fp32 cotangents with bf16
    kernels (dtype-mismatch error) — so bf16 convs keep bf16 outputs."""
    if preferred_dtype is None or x.dtype != jnp.float32:
        return None
    return preferred_dtype


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int | tuple[int, int] = 2,
    padding: int | tuple[int, int] = 0,
    preferred_dtype: jnp.dtype | None = jnp.float32,
) -> jax.Array:
    """Transposed 2-D convolution. x: [N,H,W,Cin], w: [kH,kW,Cin,Cout].

    Matches torch ConvTranspose2d(Cin, Cout, k, stride) with torch weight
    (Cin, Cout, kH, kW) mapped to HWIO via ``w = W.permute(2, 3, 0, 1)``.

    Implemented as input-dilated (fractionally-strided) convolution with the
    kernel flipped spatially: out = conv(dilate(x, s), flip(w), pad=k-1-p).
    This keeps the op on the MXU as a dense conv rather than a scatter.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    kh, kw = w.shape[0], w.shape[1]
    w_flipped = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=[(kh - 1 - padding[0], kh - 1 - padding[0]),
                 (kw - 1 - padding[1], kw - 1 - padding[1])],
        lhs_dilation=stride,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=_preferred(x, preferred_dtype),
    )
