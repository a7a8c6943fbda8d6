"""Pallas TPU kernel: the reference's ENTIRE DoubleConv in one kernel.

(conv3×3 → scale/bias → ReLU) × 2 with the intermediate activation held in
VMEM — it never touches HBM. At the U-Net's large-spatial levels (64–128
channels) the DoubleConv is HBM-bound, so eliminating the mid-tensor
round-trip (read+write of H·W·Cmid) is the dominant win; the cost is
recomputing a 2-px halo of conv1 per block.

Blocking: grid (N, H/TH, W/WB, Cout/COb). A (TH+4)×(WB+4) input window is
assembled from FOUR (TH, WB) slabs — (i,j), (i+1,j), (i,j+1), (i+1,j+1) —
because this Pallas version has no overlapping BlockSpec windows; the host
pads the array to the slab grid. Accumulation goes through VMEM scratch
refs: value accumulation kept all 9 tap temporaries live and overflowed the
16 MB VMEM stack at large widths (34.8 MB measured at W=480 unblocked).

Correctness is asserted against two chained fused convs in
tests/test_kernels.py and on-chip in the kernel smoke.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dc_kernel(
    xa_ref, xb_ref, xc_ref, xd_ref, w1_ref, sb1_ref, w2_ref, sb2_ref, o_ref,
    acc1_ref, mid_ref, acc2_ref, x_ref, *, th, wb, h, w_img,
):
    # Slabs: xa=(i,j) xb=(i+1,j) xc=(i,j+1) xd=(i+1,j+1), each [1, TH, WB, Cin].
    # w1: [3,3,Cin,Cmid]; w2: [3,3,Cmid,COb]; sb: [2,C]; o: [1, TH, WB, COb].
    # Scratch: acc1/acc2 fp32 accumulators, mid (VMEM-resident intermediate),
    # x (assembled window) — ref-staging + traced-dy tap loops keep the
    # kernel stack at ≤3 live patches (9 unrolled taps OOMed at fp32/256ch:
    # 19.0 MB measured vs the 16 MB limit).
    cin = xa_ref.shape[-1]
    cmid = w1_ref.shape[-1]
    mid_h, mid_w = th + 2, wb + 2

    x_ref[:th, :wb] = xa_ref[0]
    x_ref[th:, :wb] = xb_ref[0, :4]
    x_ref[:th, wb:] = xc_ref[0, :, :4]
    x_ref[th:, wb:] = xd_ref[0, :4, :4]

    acc1_ref[...] = jnp.zeros_like(acc1_ref)

    def tap1(dy, _):
        for dx in range(3):
            patch = x_ref[pl.ds(dy, mid_h), dx : dx + mid_w, :]
            acc1_ref[...] += jnp.dot(
                patch.reshape(mid_h * mid_w, cin), w1_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, 3, tap1, 0)
    mid = jnp.maximum(acc1_ref[...] * sb1_ref[0][None, :] + sb1_ref[1][None, :], 0.0)
    mid = mid.reshape(mid_h, mid_w, cmid)

    # conv2's SAME padding must be ZERO, but conv1 evaluated over the global
    # image border yields relu(bias) ≠ 0 there — zero mid rows/cols whose
    # global index is outside the image. 3-D iotas (Mosaic cannot insert a
    # minor dim on a 1-bit mask).
    i = pl.program_id(1)
    j = pl.program_id(2)
    row_g = i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (mid_h, mid_w, 1), 0)
    col_g = j * wb - 1 + jax.lax.broadcasted_iota(jnp.int32, (mid_h, mid_w, 1), 1)
    inside = (row_g >= 0) & (row_g < h) & (col_g >= 0) & (col_g < w_img)
    mid_ref[...] = jnp.where(inside, mid, 0.0).astype(mid_ref.dtype)

    acc2_ref[...] = jnp.zeros_like(acc2_ref)

    def tap2(dy, _):
        for dx in range(3):
            patch = mid_ref[pl.ds(dy, th), dx : dx + wb, :]
            acc2_ref[...] += jnp.dot(
                patch.reshape(th * wb, cmid), w2_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, 3, tap2, 0)
    y = jnp.maximum(acc2_ref[...] * sb2_ref[0][None, :] + sb2_ref[1][None, :], 0.0)
    o_ref[0] = y.reshape(th, wb, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "cout_block", "out_dtype")
)
def fused_double_conv(
    x: jax.Array,
    w1: jax.Array,
    scale1: jax.Array,
    bias1: jax.Array,
    w2: jax.Array,
    scale2: jax.Array,
    bias2: jax.Array,
    *,
    tile_h: int = 8,
    tile_w: int = 128,
    cout_block: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """relu(conv2(relu(conv1(x)·s1+b1))·s2+b2), both convs 3×3 SAME.

    x: [N,H,W,Cin] → [N,H,W,Cout]. The folded-BN DoubleConv of the
    reference (unet/unet_parts.py — DoubleConv, UNVERIFIED mount) as ONE
    TPU kernel.
    """
    n, h, w_img, cin = x.shape
    cmid = w1.shape[-1]
    cout = w2.shape[-1]
    out_dtype = out_dtype or x.dtype

    th = max(4, min(tile_h, h))
    # Pallas TPU requires the second-to-last block dim divisible by 8.
    wb = max(8, min(tile_w, -(-w_img // 8) * 8))
    ht = -(-h // th)
    wt = -(-w_img // wb)
    cob = cout_block or min(cout, 256)
    if cout % cob:
        raise ValueError(f"cout {cout} not divisible by cout_block {cob}")
    ct = cout // cob

    # Pad: 2 top/left for the two SAME convs; out to (grid+1) slabs each way.
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (2, (ht + 1) * th - h - 2),
            (2, (wt + 1) * wb - w_img - 2),
            (0, 0),
        ),
    )

    sb1 = jnp.stack([scale1.astype(jnp.float32), bias1.astype(jnp.float32)])
    sb2 = jnp.stack([scale2.astype(jnp.float32), bias2.astype(jnp.float32)])

    def slab(di, dj):
        return pl.BlockSpec(
            (1, th, wb, cin),
            lambda b, i, j, c, di=di, dj=dj: (b, i + di, j + dj, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(_dc_kernel, th=th, wb=wb, h=h, w_img=w_img),
        grid=(n, ht, wt, ct),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            slab(0, 0), slab(1, 0), slab(0, 1), slab(1, 1),
            pl.BlockSpec((3, 3, cin, cmid), lambda b, i, j, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cmid), lambda b, i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cmid, cob), lambda b, i, j, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cob), lambda b, i, j, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wb, cob), lambda b, i, j, c: (b, i, j, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, ht * th, wt * wb, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * (wb + 2), cmid), jnp.float32),
            pltpu.VMEM((th + 2, wb + 2, cmid), x.dtype),
            pltpu.VMEM((th * wb, cob), jnp.float32),
            pltpu.VMEM((th + 4, wb + 4, cin), xp.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * wt * wb * (cin * cmid + cmid * cout),
            bytes_accessed=(
                xp.size * xp.dtype.itemsize * 4
                + (w1.size + w2.size) * w1.dtype.itemsize
                + n * h * w_img * cout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(xp, xp, xp, xp, w1, sb1, w2, sb2)
    return out[:, :h, :w_img]


# Channel ceiling for the fused path: both weight tensors and the VMEM mid
# must fit comfortably; above this the single-conv kernels / XLA take over.
FUSED_DC_MAX_CHANNELS = 256
