"""Pallas TPU kernel: im2col 3×3 conv for the narrow-channel levels, NHWC.

Why this exists (measured, BENCH_NOTES.md round 2): the 572² C=64 level is
50.4% of the train step at ~21% conv efficiency. Both XLA's conv emitter and
our 9-shifted-matmul kernels (fused_conv.py, train_conv.py) stage the MXU
contraction with K = Cin; at Cin=64, Cout=64 the 128×128 systolic array runs
≤25% utilized (K and N both half-filled). im2col fixes the K half: build the
patch matrix [rows, 9·Cin] in VMEM (nine static-offset copies) and issue ONE
matmul with K = 9·64 = 576 — the K dimension is full and only N=64 remains
half-filled, raising the ceiling to ~50%.

MEASURED OUTCOME (on-chip, 572² b16 bf16 — keep for the record; this kernel
is NOT wired into any production path): parity-exact, but 24.1 ms vs XLA's
16.2 ms at 64→64 (and 25.4 vs 15.8 at 128→64), identical in per-row and
merged single-matmul modes — so the bound is NOT matmul granularity but the
nine tap copies' VMEM traffic (~10.6 MB/block write+read ≈ 500 GB/s
sustained). Conclusion recorded in BENCH_NOTES.md: the C=64 level is
emitter-bound; XLA's conv emitter stays.

Patch layout note: ``patch`` stays 3-D ``[TH, W, 9·Cin]`` and the matmul
loops over the TH rows — merging (TH, W) into one row dim would be a Mosaic
relayout at W % 8 ≠ 0 (572), while dropping a leading static index is free.
Tap copies write at static lane offsets (tap·Cin) from sublane offsets
dx ∈ {0,1,2}; both are patterns the round-1 kernels proved legal.

Weights are passed flattened [9·Cin, Cout] with w.reshape(9*cin, cout) —
index ((3·dy+dx)·Cin + c), matching the patch write order.

reference: unet/unet_parts.py — DoubleConv's Conv2d (UNVERIFIED mount,
SURVEY.md §2 #1); this kernel targets its Cin,Cout ≤ 128 instances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _im2col_kernel(xa_ref, xb_ref, w_ref, sb_ref, o_ref, x_ref, patch_ref, *,
                   th, apply_relu, merged):
    # xa/xb: [1, TH, Wp, Cin] consecutive input slabs; w: [9·Cin, Cout];
    # sb: [2, Cout]; o: [1, TH, W, Cout]; x/patch: VMEM scratch.
    w_out = o_ref.shape[2]
    cin = xa_ref.shape[-1]

    x_ref[:th] = xa_ref[0]
    x_ref[th:] = xb_ref[0, :2]

    # Nine tap copies at static (sublane=dx, lane=tap·Cin) offsets.
    for dy in range(3):
        for dx in range(3):
            k = (dy * 3 + dx) * cin
            patch_ref[:, :, k : k + cin] = x_ref[dy : dy + th, dx : dx + w_out, :]

    scale = sb_ref[0][None, :]
    bias = sb_ref[1][None, :]
    if merged:
        # W is padded to a multiple of 8 by the host, so merging (TH, W) is
        # layout-free and the whole slab is ONE [TH·W, 9·Cin] matmul.
        acc = jnp.dot(patch_ref[...].reshape(th * w_out, 9 * cin), w_ref[...],
                      preferred_element_type=jnp.float32)
        y = acc * scale + bias
        if apply_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0] = y.reshape(th, w_out, -1).astype(o_ref.dtype)
    else:
        # One K=9·Cin matmul per slab row (see layout note in the module doc).
        for i in range(th):
            acc = jnp.dot(patch_ref[i], w_ref[...],
                          preferred_element_type=jnp.float32)
            y = acc * scale + bias
            if apply_relu:
                y = jnp.maximum(y, 0.0)
            o_ref[0, i] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("apply_relu", "tile_h", "out_dtype", "merged")
)
def im2col_conv3x3(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    apply_relu: bool = False,
    tile_h: int = 8,
    out_dtype=None,
    merged: bool = False,
) -> jax.Array:
    """y = [relu](conv3x3_same(x, w) * scale + bias), im2col formulation.

    x: [N,H,W,Cin] → [N,H,W,Cout]. Intended for Cin ≤ 128 (the patch scratch
    is TH·W·9·Cin·itemsize — 5.3 MB at TH=8, W=572, Cin=64 bf16; wide levels
    should keep the K=Cin staging of fused_conv.py, which is already
    MXU-efficient there).
    """
    n, h, w_in, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype

    th = min(tile_h, h)
    ht = -(-h // th)
    pad_h_total = (ht + 1) * th
    # merged mode: widen the in-kernel output W to a multiple of 8 so the
    # (TH, W) merge before the single matmul is a layout no-op.
    w_k = -(-w_in // 8) * 8 if merged else w_in
    xp = jnp.pad(x, ((0, 0), (1, pad_h_total - h - 1), (1, w_k - w_in + 1), (0, 0)))
    wp = w_k + 2

    wflat = w.reshape(9 * cin, cout).astype(x.dtype)
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])

    out = pl.pallas_call(
        functools.partial(_im2col_kernel, th=th, apply_relu=apply_relu,
                          merged=merged),
        grid=(n, ht),
        in_specs=[
            pl.BlockSpec((1, th, wp, cin), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, cin), lambda b, i: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_k, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ht * th, w_k, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cin), xp.dtype),
            pltpu.VMEM((th, w_k, 9 * cin), xp.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            # Patch scratch + tap-copy temporaries exceed the default 16 MB
            # scoped budget at full-res; v5e has 128 MB physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * w_in * cin * cout,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize * 2 + wflat.size * wflat.dtype.itemsize
                + n * h * w_in * cout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(xp, xp, wflat, sb)
    return out[:, :h, :w_in]
