"""Pallas TPU kernel: fused 3×3 conv + (folded-BN) scale/bias + ReLU, NHWC.

This is the TPU-native replacement for what cuDNN did for the reference's
DoubleConv (reference: unet/unet_parts.py — Conv2d→BatchNorm2d→ReLU, cuDNN
underneath; SURVEY.md §2.1): one kernel produces the normalized, activated
output directly — conv epilogue (scale·acc+bias, ReLU) runs on the VPU while
the 9 shifted matmuls run on the MXU, and the intermediate conv result never
round-trips to HBM.

Design
------
* 3×3 conv as 9 shifted matmuls: for each tap (dy,dx),
  ``acc += X[dy:dy+TH, dx:dx+W] @ W[dy,dx]`` — each a (TH·W, Cin)×(Cin, COb)
  MXU contraction with fp32 accumulation. No im2col materialization.
* Grid (N, H/TH, Cout/COb). The halo rows for a TH-row output slab come from
  fetching TWO consecutive TH-row input slabs (this Pallas version has no
  overlapping BlockSpec windows); the host pre-pads H to (HT+1)·TH and W by 1
  so every slab index is in range. Costs ≤2× input HBM traffic; the op is
  MXU-bound for Cin ≥ 64 so this does not gate throughput.
* bf16 in / fp32 accumulate / bf16-or-fp32 out, matching the AMP train path.

Used by the inference path (models/infer.py) with BN folded into (scale,
bias); correctness is asserted against the XLA path in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(xa_ref, xb_ref, w_ref, sb_ref, o_ref, acc_ref, x_ref, *, th, apply_relu):
    # xa/xb: [1, TH, Wp, Cin] consecutive input slabs; w: [3, 3, Cin, COb];
    # sb: [2, COb] (scale, bias); o: [1, TH, W, COb]; acc/x: VMEM scratch.
    # Accumulating into a scratch REF (not a value) sequences the 9 taps —
    # value-accumulation kept all tap temporaries live at once and blew the
    # 16 MB VMEM stack at large W (measured: 34.8 MB at W=480).
    w_out = o_ref.shape[2]
    cin = xa_ref.shape[-1]

    x_ref[:th] = xa_ref[0]
    x_ref[th:] = xb_ref[0, :2]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    # fori over dy only: with all 9 taps unrolled Mosaic co-hoists every
    # patch copy and the kernel stack overflows at wide channels (18.5 MB
    # measured at Cin=1024 fp32). Constraints shaping this form: Mosaic has
    # no dynamic_slice on VALUES (hence the x scratch ref), and dynamic ref
    # starts on the sublane (W) dim must be 8-aligned — so dy (dim 0,
    # unconstrained) is the traced index while dx stays static; at most 3
    # patches are live.
    def tap_row(dy, _):
        for dx in range(3):
            patch = x_ref[pl.ds(dy, th), dx : dx + w_out, :]
            acc_ref[...] += jnp.dot(
                patch.reshape(th * w_out, cin), w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, 3, tap_row, 0)
    y = acc_ref[...] * sb_ref[0][None, :] + sb_ref[1][None, :]
    if apply_relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.reshape(th, w_out, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("apply_relu", "tile_h", "cout_block", "out_dtype")
)
def fused_conv3x3_scale_relu(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    apply_relu: bool = True,
    tile_h: int = 8,
    cout_block: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """y = relu(conv3x3_same(x, w) * scale + bias). x: [N,H,W,Cin] → [N,H,W,Cout].

    With BN folded in (scale=γ/√(σ²+ε), bias=β−μ·scale) this is the
    reference's Conv→BN→ReLU in ONE kernel; with scale=1 it is conv+bias.
    """
    n, h, w_in, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype

    th = min(tile_h, h)
    ht = -(-h // th)  # number of output slabs
    # Weight block 9·Cin·COb·itemsize must stay a few MB: shrink COb for
    # wide layers (bottleneck 1024ch fp32 would otherwise be 9.4 MB/block).
    default_cob = 128 if cin >= 512 else 256
    cob = cout_block or min(cout, default_cob)
    ct = -(-cout // cob)
    if cout % cob:
        raise ValueError(f"cout {cout} not divisible by cout_block {cob}")

    # Host-side pad: 1 left/top for SAME, right/bottom up to slab grid + halo.
    pad_h_total = (ht + 1) * th  # slab grid covers [0, (ht+1)·th) rows
    xp = jnp.pad(
        x, ((0, 0), (1, pad_h_total - h - 1), (1, 1), (0, 0))
    )
    wp = w_in + 2

    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])

    grid = (n, ht, ct)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, th=th, apply_relu=apply_relu),
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, th, wp, cin), lambda b, i, c: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, cin), lambda b, i, c: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cob), lambda b, i, c: (0, 0, 0, c),
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
            pltpu.VMEM((th * w_in, cob), jnp.float32),
            pltpu.VMEM((th + 2, wp, cin), xp.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * w_in * cin * cout,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize * 2 + w.size * w.dtype.itemsize
                + n * h * w_in * cout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(xp, xp, w, sb)
    return out[:, :h]


def _dual_conv_kernel(
    aa_ref, ab_ref, ba_ref, bb_ref, wa_ref, wb_ref, sb_ref, o_ref,
    acc_ref, xa_ref, xb_ref, *, th, apply_relu,
):
    # Two sources (a: skip, b: upsampled), each as a consecutive slab pair;
    # wa: [3,3,Ca,COb], wb: [3,3,Cb,COb]. Computes
    # relu((conv(a, wa) + conv(b, wb))·s + bias) ≡ the decoder's
    # conv3×3(concat([a, b]))·BN·ReLU WITHOUT materializing the concat.
    w_out = o_ref.shape[2]
    ca = aa_ref.shape[-1]
    cb = ba_ref.shape[-1]

    xa_ref[:th] = aa_ref[0]
    xa_ref[th:] = ab_ref[0, :2]
    xb_ref[:th] = ba_ref[0]
    xb_ref[th:] = bb_ref[0, :2]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def tap_row(dy, _):
        for dx in range(3):
            pa = xa_ref[pl.ds(dy, th), dx : dx + w_out, :]
            acc_ref[...] += jnp.dot(
                pa.reshape(th * w_out, ca), wa_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
            pb = xb_ref[pl.ds(dy, th), dx : dx + w_out, :]
            acc_ref[...] += jnp.dot(
                pb.reshape(th * w_out, cb), wb_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, 3, tap_row, 0)
    y = acc_ref[...] * sb_ref[0][None, :] + sb_ref[1][None, :]
    if apply_relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.reshape(th, w_out, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("apply_relu", "tile_h", "cout_block", "out_dtype")
)
def fused_conv3x3_concat_scale_relu(
    a: jax.Array,
    b: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    apply_relu: bool = True,
    # Two sources double the slab/window footprint; 8 rows overflowed the
    # VMEM stack at fp32 full-res (18.0 MB measured) — 4 rows fits.
    tile_h: int = 4,
    cout_block: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """relu(conv3x3_same(concat([a, b], -1), w)·scale + bias), concat-free.

    a: [N,H,W,Ca] (skip), b: [N,H,W,Cb] (upsampled); w: [3,3,Ca+Cb,Cout]
    split into the two per-source kernels. The decoder's skip-concatenation
    fused away (north-star: "upsampling with skip-concatenation become
    fused NHWC Pallas kernels").
    """
    n, h, w_in, ca = a.shape
    cb = b.shape[-1]
    assert w.shape[2] == ca + cb, (w.shape, ca, cb)
    cout = w.shape[-1]
    out_dtype = out_dtype or a.dtype

    th = min(tile_h, h)
    ht = -(-h // th)
    cin_max = max(ca, cb)
    default_cob = 128 if cin_max >= 512 else 256
    cob = cout_block or min(cout, default_cob)
    if cout % cob:
        raise ValueError(f"cout {cout} not divisible by cout_block {cob}")
    ct = cout // cob

    pad_h_total = (ht + 1) * th
    ap = jnp.pad(a, ((0, 0), (1, pad_h_total - h - 1), (1, 1), (0, 0)))
    bp = jnp.pad(b, ((0, 0), (1, pad_h_total - h - 1), (1, 1), (0, 0)))
    wp = w_in + 2
    wa, wb = w[:, :, :ca, :], w[:, :, ca:, :]
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])

    def slab(src_c, di):
        return pl.BlockSpec(
            (1, th, wp, src_c),
            lambda bidx, i, c, di=di: (bidx, i + di, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(_dual_conv_kernel, th=th, apply_relu=apply_relu),
        grid=(n, ht, ct),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            slab(ca, 0), slab(ca, 1), slab(cb, 0), slab(cb, 1),
            pl.BlockSpec((3, 3, ca, cob), lambda bi, i, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cb, cob), lambda bi, i, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cob), lambda bi, i, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_in, cob), lambda bi, i, c: (bi, i, 0, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, ht * th, w_in, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th * w_in, cob), jnp.float32),
            pltpu.VMEM((th + 2, wp, ca), ap.dtype),
            pltpu.VMEM((th + 2, wp, cb), bp.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * w_in * (ca + cb) * cout,
            bytes_accessed=(
                (ap.size + bp.size) * ap.dtype.itemsize * 2
                + w.size * w.dtype.itemsize
                + n * h * w_in * cout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(ap, ap, bp, bp, wa, wb, sb)
    return out[:, :h]
