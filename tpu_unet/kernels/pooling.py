"""Pallas TPU kernel: 2×2/2 max pooling, NHWC.

The reference's ``MaxPool2d(2)`` (unet/unet_parts.py — Down, UNVERIFIED
mount) as a single VPU pass: non-overlapping windows mean clean block
tiling with no halo. Strided lane/sublane slices lower to strided vector
loads on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_kernel(x_ref, o_ref):
    # x: [1, 2·TH, W, C] → o: [1, TH, W/2, C]. Mosaic forbids stride-2
    # slices, so pool via reshapes: split the row dim (a plain batch dim)
    # and the W sublane dim into pairs, then reduce each pair.
    x = x_ref[0]
    th2, w, c = x.shape
    rows = x.reshape(th2 // 2, 2, w, c)
    row_pooled = jnp.maximum(rows[:, 0], rows[:, 1])          # [TH, W, C]
    cols = row_pooled.reshape(th2 // 2, w // 2, 2, c)
    o_ref[0] = jnp.maximum(cols[:, :, 0], cols[:, :, 1])      # [TH, W/2, C]


@functools.partial(jax.jit, static_argnames=("tile_h",))
def max_pool2x2(x: jax.Array, *, tile_h: int = 8) -> jax.Array:
    # tile_h=8: the pair-splitting reshapes cost ~9× the input block in VMEM
    # stack (relayout copies); 16 rows OOMed the 16 MB limit at 480×64
    # (18.57 MB measured), 8 rows peak ≈ 9.3 MB at the worst U-Net shape.
    """[N,H,W,C] → [N,H//2,W//2,C], floor mode (odd trailing row/col dropped)."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : 2 * h2, : 2 * w2]  # floor mode, torch parity

    th = min(tile_h, h2)
    ht = -(-h2 // th)
    if h2 % th:
        # Pad rows so the slab grid divides evenly; padded outputs are cropped.
        x = jnp.pad(x, ((0, 0), (0, 2 * (ht * th - h2)), (0, 0), (0, 0)))

    out = pl.pallas_call(
        _pool_kernel,
        grid=(n, ht),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, 2 * th, 2 * w2, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w2, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ht * th, w2, c), x.dtype),
    )(x)
    return out[:, :h2]
