"""Pooling ops, NHWC. Parity: torch.nn.MaxPool2d(2) (reference:
unet/unet_parts.py — Down, UNVERIFIED mount, SURVEY.md §2 #2).

``lax.reduce_window`` with VALID padding reproduces torch's floor-mode output
size for odd inputs and lowers to a single VPU pass on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """Max pooling. x: [N,H,W,C] -> [N,H//w,W//w,C] (floor mode, like torch).

    The common 2×2/2 case lowers via pair-splitting reshapes + max — measured
    ~10× faster than ``lax.reduce_window`` on TPU bf16 (whose backward,
    select_and_scatter, is slower still; the reshape form differentiates
    into plain masked scatters). General window/stride falls back to
    reduce_window. Tie-gradient note: reshape-max splits gradient among
    tied maxima while torch routes to the first — forward values identical.
    """
    if stride is None:
        stride = window
    if window == 2 and stride == 2:
        n, h, w, c = x.shape
        h2, w2 = h // 2, w // 2
        x = x[:, : 2 * h2, : 2 * w2]
        x = x.reshape(n, h2, 2, w2, 2, c)
        return jnp.maximum(
            jnp.maximum(x[:, :, 0, :, 0], x[:, :, 0, :, 1]),
            jnp.maximum(x[:, :, 1, :, 0], x[:, :, 1, :, 1]),
        )
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
