"""Pallas TPU kernel: the reference's ENTIRE DoubleConv in one kernel.

(conv3×3 → scale/bias → ReLU) × 2 with the intermediate activation held in
VMEM — it never touches HBM. At the U-Net's large-spatial levels (64–128
channels) the DoubleConv is HBM-bound, so eliminating the mid-tensor
round-trip (read+write of H·W·Cmid) is the dominant win; the cost is
recomputing a 2-row halo of conv1 per slab (2/TH overhead).

Used for levels with Cin, Cmid ≤ 256 (weights for both convs must fit VMEM
alongside the slabs); the bottleneck levels stay on the single fused conv /
XLA path, which is compute-bound there anyway. Correctness asserted against
two chained fused convs in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dc_kernel(
    xa_ref, xb_ref, w1_ref, sb1_ref, w2_ref, sb2_ref, o_ref,
    acc1_ref, mid_ref, acc2_ref, *, th, h,
):
    # xa/xb: [1, TH, W+4, Cin] two consecutive slabs (≥ TH+4 rows combined).
    # w1: [3,3,Cin,Cmid]; w2: [3,3,Cmid,COb]; sb: [2, C]; o: [1, TH, W, COb].
    # acc1/mid/acc2: VMEM scratch — ref accumulation sequences the taps so
    # the VMEM stack stays O(one patch) instead of O(9 patches) (value
    # accumulation OOMed the 16 MB stack at W=480: 34.8 MB measured).
    w_out = o_ref.shape[2]
    cin = xa_ref.shape[-1]
    cmid = w1_ref.shape[-1]
    mid_h, mid_w = th + 2, w_out + 2

    x = jnp.concatenate([xa_ref[0], xb_ref[0, :4]], axis=0)  # [TH+4, W+4, Cin]

    acc1_ref[...] = jnp.zeros_like(acc1_ref)
    for dy in range(3):
        for dx in range(3):
            patch = x[dy : dy + mid_h, dx : dx + mid_w, :].reshape(mid_h * mid_w, cin)
            acc1_ref[...] += jnp.dot(patch, w1_ref[dy, dx], preferred_element_type=jnp.float32)
    mid = jnp.maximum(acc1_ref[...] * sb1_ref[0][None, :] + sb1_ref[1][None, :], 0.0)
    mid = mid.reshape(mid_h, mid_w, cmid)

    # conv2's SAME padding must be ZERO, but conv1 evaluated over the global
    # image border yields relu(bias) ≠ 0 there — zero the mid rows/cols whose
    # global index falls outside the image. 3-D iotas from the start: Mosaic
    # cannot insert a minor dim on a 1-bit mask.
    i = pl.program_id(1)
    row_g = i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (mid_h, mid_w, 1), 0)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (mid_h, mid_w, 1), 1) - 1
    inside = (row_g >= 0) & (row_g < h) & (col_g >= 0) & (col_g < w_out)
    mid_ref[...] = jnp.where(inside, mid, 0.0).astype(mid_ref.dtype)

    acc2_ref[...] = jnp.zeros_like(acc2_ref)
    for dy in range(3):
        for dx in range(3):
            patch = mid_ref[dy : dy + th, dx : dx + w_out, :].reshape(th * w_out, cmid)
            acc2_ref[...] += jnp.dot(patch, w2_ref[dy, dx], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc2_ref[...] * sb2_ref[0][None, :] + sb2_ref[1][None, :], 0.0)
    o_ref[0] = y.reshape(th, w_out, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "cout_block", "out_dtype"))
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
    cout_block: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """relu(conv2(relu(conv1(x)·s1+b1))·s2+b2), both convs 3×3 SAME.

    x: [N,H,W,Cin] → [N,H,W,Cout]. The folded-BN DoubleConv of the
    reference (unet/unet_parts.py — DoubleConv, UNVERIFIED mount) as ONE
    TPU kernel.
    """
    n, h, w_in, cin = x.shape
    cmid = w1.shape[-1]
    cout = w2.shape[-1]
    out_dtype = out_dtype or x.dtype

    th = max(4, min(tile_h, h))  # two TH-slabs must cover TH+4 rows
    ht = -(-h // th)
    cob = cout_block or min(cout, 256)
    if cout % cob:
        raise ValueError(f"cout {cout} not divisible by cout_block {cob}")
    ct = cout // cob

    # Pad: 2 top/left for the two SAME convs; bottom up to (ht+1) slabs.
    pad_h_total = (ht + 1) * th
    xp = jnp.pad(x, ((0, 0), (2, pad_h_total - h - 2), (2, 2), (0, 0)))
    wp = w_in + 4

    sb1 = jnp.stack([scale1.astype(jnp.float32), bias1.astype(jnp.float32)])
    sb2 = jnp.stack([scale2.astype(jnp.float32), bias2.astype(jnp.float32)])

    out = pl.pallas_call(
        functools.partial(_dc_kernel, th=th, h=h),
        grid=(n, ht, ct),
        in_specs=[
            pl.BlockSpec((1, th, wp, cin), lambda b, i, c: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, cin), lambda b, i, c: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cmid), lambda b, i, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cmid), lambda b, i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cmid, cob), lambda b, i, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cob), lambda b, i, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_in, cob), lambda b, i, c: (b, i, 0, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, ht * th, w_in, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * (w_in + 2), cmid), jnp.float32),
            pltpu.VMEM((th + 2, w_in + 2, cmid), x.dtype),
            pltpu.VMEM((th * w_in, cob), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * w_in * (cin * cmid + cmid * cout),
            bytes_accessed=(
                xp.size * xp.dtype.itemsize * 2
                + (w1.size + w2.size) * w1.dtype.itemsize
                + n * h * w_in * cout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(xp, xp, w1, sb1, w2, sb2)
    return out[:, :h]


# Channel ceiling for the fused path: both weight tensors and the VMEM mid
# must fit comfortably; above this the single-conv kernels / XLA take over.
FUSED_DC_MAX_CHANNELS = 256
