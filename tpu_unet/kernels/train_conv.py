"""Pallas TPU kernels for the TRAIN-mode conv path (round-2 north star).

The reference's train hot loop is Conv→BatchNorm→ReLU chains (reference:
unet/unet_parts.py DoubleConv, UNVERIFIED mount, SURVEY.md §2 #1). Round-1
measurements (BENCH_NOTES.md, tools/bench_experiments.py) put the XLA train
step at ~48% MFU with two diagnosed leaks: the BN batch-stat reductions
(separate full passes over every conv output, ~17% of the step) and the
normalize+ReLU elementwise passes between convs. These kernels close both:

  * ``conv3x3_fwd``: 3×3 SAME conv whose *prologue* applies the previous
    BN's normalize+ReLU to the input while staging it into VMEM, and whose
    *epilogue* accumulates per-channel Σz and Σz² for THIS conv's batch
    stats — so a Conv→BN→ReLU→Conv chain touches HBM only for the raw conv
    outputs. The conv itself is 9 shifted MXU matmuls with fp32
    accumulation (the layout proven in kernels/fused_conv.py round 1).
  * ``conv3x3_dx``: the transposed conv of the backward pass. Its prologue
    materializes NOTHING: the cotangent dz = α·g + β·z + γ (the BN-backward
    affine, with per-channel α/β/γ precomputed from tiny reductions) is
    built on the fly from the upstream cotangent g and the saved raw conv
    output z while staging.
  * ``conv3x3_dw``: weight gradient as 9 patch-correlation matmuls
    (M=Cin, N=Cout, K=TH·W per slab), accumulated across the (batch,
    row-slab) grid directly into the fp32 output block. Both operands are
    built on the fly: the input side re-applies the forward prologue, the
    cotangent side the same dz affine as ``conv3x3_dx``.

``ops/conv_stats.py`` wires these into a single ``custom_vjp`` op; the rest
of the network (pool, upsample, concat, losses) stays XLA.

Mosaic constraints shaping the code (all measured on-chip in round 1 — see
kernels/fused_conv.py): accumulate into VMEM scratch refs, tap loops traced
over dy (never 9-way unrolled), no dynamic slicing of values, sublane
offsets static. Host pre-pads H to the slab grid (+1 halo row top) and W by
1+1; prologue staging re-zeroes everything outside the true image so SAME
padding applies to the *normalized* tensor, not the raw one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Forward: z = conv3x3(prologue(x)), prologue = relu(x·a + c) or identity;
# optional epilogue stats (Σz, Σz²) per channel over the valid region.
# ---------------------------------------------------------------------------


def _conv_fwd_kernel(
    *refs, th, prologue, stats, h, w_img,
):
    if prologue:
        xa_ref, xb_ref, w_ref, pro_ref = refs[:4]
        rest = refs[4:]
    else:
        xa_ref, xb_ref, w_ref = refs[:3]
        rest = refs[3:]
    if stats:
        o_ref, st_ref, acc_ref, x_ref = rest
    else:
        o_ref, acc_ref, x_ref = rest

    w_out = o_ref.shape[2]
    cin = xa_ref.shape[-1]
    # Grid (ct, n, ht): weight-stationary (each Cout block's weights fetched
    # once) and, critically, the stats block's accumulation revisits are
    # consecutive — interleaved revisits corrupt on-chip (see _wgrad_kernel).
    b = pl.program_id(1)
    i = pl.program_id(2)

    def stage(raw, rows0, nrows):
        if not prologue:
            x_ref[rows0 : rows0 + nrows] = raw
            return
        a = pro_ref[0][None, None, :]
        c = pro_ref[1][None, None, :]
        v = jnp.maximum(raw.astype(jnp.float32) * a + c, 0.0)
        # Zero outside the image: the padded ring must stay zero AFTER the
        # affine (relu(0·a+c) = relu(c) ≠ 0 would corrupt SAME padding).
        m = jax.lax.broadcasted_iota(jnp.int32, (nrows, raw.shape[1], 1), 0)
        row_g = i * th + rows0 + m - 1
        colm = jax.lax.broadcasted_iota(jnp.int32, (nrows, raw.shape[1], 1), 1) - 1
        ok = (row_g >= 0) & (row_g < h) & (colm >= 0) & (colm < w_img)
        x_ref[rows0 : rows0 + nrows] = jnp.where(ok, v, 0.0).astype(x_ref.dtype)

    stage(xa_ref[0], 0, th)
    stage(xb_ref[0, :2], th, 2)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def tap_row(dy, _):
        for dx in range(3):
            patch = x_ref[pl.ds(dy, th), dx : dx + w_out, :]
            acc_ref[...] += jnp.dot(
                patch.reshape(th * w_out, cin), w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, 3, tap_row, 0)
    y = acc_ref[...].reshape(th, w_out, o_ref.shape[-1]).astype(o_ref.dtype)
    o_ref[0] = y

    if stats:
        # Stats from the CAST output (matches the XLA path, which computes
        # BN statistics over the stored — possibly bf16 — activation).
        @pl.when((b == 0) & (i == 0))
        def _():
            st_ref[...] = jnp.zeros_like(st_ref)

        yf = y.astype(jnp.float32)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0) + i * th < h
        )
        yv = jnp.where(valid, yf, 0.0)
        st_ref[0] += jnp.sum(yv, axis=(0, 1))
        st_ref[1] += jnp.sum(yv * yv, axis=(0, 1))


@functools.partial(
    jax.jit,
    static_argnames=("stats", "tile_h", "cout_block", "out_dtype"),
)
def conv3x3_fwd(
    x: jax.Array,
    w: jax.Array,
    in_scale: jax.Array | None = None,
    in_bias: jax.Array | None = None,
    *,
    stats: bool = False,
    tile_h: int = 8,
    cout_block: int | None = None,
    out_dtype=None,
):
    """z = conv3x3_same(relu(x·in_scale + in_bias)), raw (no output affine).

    x: [N,H,W,Cin] → z: [N,H,W,Cout]. With ``stats``, also returns
    [2, Cout] fp32 (Σz, Σz²) over the valid output region — the producing
    kernel's epilogue computes the next BN's batch statistics, removing the
    separate full-tensor reduction pass (BENCH_NOTES.md headroom #3).
    """
    n, h, w_img, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    prologue = in_scale is not None

    if cin < 8:
        # Mosaic rejects tiny channel counts (the image's 3 input channels);
        # zero-pad to the 8-sublane minimum — zero channels contribute zero.
        pad_c = 8 - cin
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        if prologue:
            in_scale = jnp.pad(in_scale, (0, pad_c))
            in_bias = jnp.pad(in_bias, (0, pad_c))
        cin = 8

    th = min(tile_h, h)
    ht = -(-h // th)
    default_cob = 128 if cin >= 512 else 256
    cob = cout_block or min(cout, default_cob)
    ct = -(-cout // cob)
    if cout % cob:
        raise ValueError(f"cout {cout} % cout_block {cob} != 0")

    xp = jnp.pad(x, ((0, 0), (1, (ht + 1) * th - h - 1), (1, 1), (0, 0)))
    wp = w_img + 2

    in_specs = [
        pl.BlockSpec((1, th, wp, cin), lambda c, b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, wp, cin), lambda c, b, i: (b, i + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, cin, cob), lambda c, b, i: (0, 0, 0, c),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xp, xp, w]
    if prologue:
        pro = jnp.stack(
            [in_scale.astype(jnp.float32), in_bias.astype(jnp.float32)]
        )
        in_specs.append(
            pl.BlockSpec((2, cin), lambda c, b, i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(pro)

    out_shape = [jax.ShapeDtypeStruct((n, ht * th, w_img, cout), out_dtype)]
    out_specs = [
        pl.BlockSpec((1, th, w_img, cob), lambda c, b, i: (b, i, 0, c),
                     memory_space=pltpu.VMEM)
    ]
    if stats:
        out_shape.append(jax.ShapeDtypeStruct((2, cout), jnp.float32))
        out_specs.append(
            pl.BlockSpec((2, cob), lambda c, b, i: (0, c),
                         memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        functools.partial(
            _conv_fwd_kernel, th=th, prologue=prologue, stats=stats,
            h=h, w_img=w_img,
        ),
        grid=(ct, n, ht),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((th * w_img, cob), jnp.float32),
            pltpu.VMEM((th + 2, wp, cin), x.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            # Stack temporaries (staging casts, stats epilogue, tap
            # copies) exceed the default 16 MB scoped-VMEM budget at the
            # U-Net's full-res shapes (measured 16.7 MB at 576x572x64
            # bf16); v5e has 128 MB physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * w_img * cin * cout,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize * 2 + w.size * w.dtype.itemsize
                + n * h * w_img * cout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(*operands)
    # out_shape is always a list, so pallas_call returns a tuple in BOTH
    # modes — outs[0] is the conv output regardless of stats.
    z = outs[0][:, :h]
    if stats:
        return z, outs[1]
    return z


# ---------------------------------------------------------------------------
# Backward dx: conv3x3 of the on-the-fly cotangent dz = α·g + β·z + γ with
# the flipped/transposed weights. g, z: [N,H,W,C]; returns [N,H,W,Cin_fwd].
# ---------------------------------------------------------------------------


def _conv_dz_kernel(
    ga_ref, gb_ref, za_ref, zb_ref, w_ref, coef_ref, o_ref, acc_ref, x_ref,
    *, th, h, w_img,
):
    w_out = o_ref.shape[2]
    c = ga_ref.shape[-1]
    i = pl.program_id(2)  # grid (ct, n, ht) — weight-stationary, as in fwd

    def stage(g, z, rows0, nrows):
        al = coef_ref[0][None, None, :]
        be = coef_ref[1][None, None, :]
        ga = coef_ref[2][None, None, :]
        v = al * g.astype(jnp.float32) + be * z.astype(jnp.float32) + ga
        m = jax.lax.broadcasted_iota(jnp.int32, (nrows, g.shape[1], 1), 0)
        row_g = i * th + rows0 + m - 1
        colm = jax.lax.broadcasted_iota(jnp.int32, (nrows, g.shape[1], 1), 1) - 1
        ok = (row_g >= 0) & (row_g < h) & (colm >= 0) & (colm < w_img)
        x_ref[rows0 : rows0 + nrows] = jnp.where(ok, v, 0.0).astype(x_ref.dtype)

    stage(ga_ref[0], za_ref[0], 0, th)
    stage(gb_ref[0, :2], zb_ref[0, :2], th, 2)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def tap_row(dy, _):
        for dx in range(3):
            patch = x_ref[pl.ds(dy, th), dx : dx + w_out, :]
            acc_ref[...] += jnp.dot(
                patch.reshape(th * w_out, c), w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, 3, tap_row, 0)
    o_ref[0] = (
        acc_ref[...].reshape(th, w_out, o_ref.shape[-1]).astype(o_ref.dtype)
    )


@functools.partial(
    jax.jit, static_argnames=("tile_h", "cout_block", "out_dtype")
)
def conv3x3_dx(
    g: jax.Array,
    z: jax.Array,
    coef: jax.Array,  # [3, C] fp32: α, β, γ — dz = α·g + β·z + γ
    w: jax.Array,     # FORWARD weights [3,3,Cin,Cout]; flipped here
    *,
    tile_h: int = 8,
    cout_block: int | None = None,
    out_dtype=None,
):
    """dx = conv3x3_same(dz, flipᴴᵂ(w)ᵀ) with dz built on the fly.

    The BN backward reduces to a per-channel affine in (g, z) once its two
    tiny reductions are known (ops/conv_stats.py derives α/β/γ), so the
    cotangent tensor dz never exists in HBM.
    """
    n, h, w_img, c = g.shape
    cin = w.shape[2]
    out_dtype = out_dtype or g.dtype
    wT = w[::-1, ::-1].transpose(0, 1, 3, 2)  # [3,3,Cout,Cin]

    th = min(tile_h, h)
    ht = -(-h // th)
    default_cob = 128 if c >= 512 else 256
    cob = cout_block or min(cin, default_cob)
    if cin % cob:
        raise ValueError(f"cin {cin} % cout_block {cob} != 0")
    ct = cin // cob

    pad = ((0, 0), (1, (ht + 1) * th - h - 1), (1, 1), (0, 0))
    gp = jnp.pad(g, pad)
    zp = jnp.pad(z, pad)
    wp = w_img + 2

    def slab(di):
        return pl.BlockSpec(
            (1, th, wp, c), lambda cc, b, i, di=di: (b, i + di, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(_conv_dz_kernel, th=th, h=h, w_img=w_img),
        grid=(ct, n, ht),
        in_specs=[
            slab(0), slab(1), slab(0), slab(1),
            pl.BlockSpec((3, 3, c, cob), lambda cc, b, i: (0, 0, 0, cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda cc, b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_img, cob), lambda cc, b, i: (b, i, 0, cc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, ht * th, w_img, cin), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th * w_img, cob), jnp.float32),
            pltpu.VMEM((th + 2, wp, c), g.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            # Stack temporaries (staging casts, stats epilogue, tap
            # copies) exceed the default 16 MB scoped-VMEM budget at the
            # U-Net's full-res shapes (measured 16.7 MB at 576x572x64
            # bf16); v5e has 128 MB physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * w_img * c * cin,
            bytes_accessed=(
                (gp.size + zp.size) * gp.dtype.itemsize * 2
                + wT.size * wT.dtype.itemsize
                + n * h * w_img * cin * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(gp, gp, zp, zp, wT, coef)
    return out[:, :h]


# ---------------------------------------------------------------------------
# Backward dw: dw[ky,kx,ci,co] = Σ prologue(x)[·, +ky-1, +kx-1, ci]·dz[·, co],
# both operands built on the fly; accumulated across (batch, slab) grid.
# ---------------------------------------------------------------------------


def _wgrad_kernel(
    *refs, th, prologue, h, w_img,
):
    if prologue:
        xa_ref, xb_ref, pro_ref, g_ref, z_ref, coef_ref, o_ref, xs_ref, dz_ref = refs
    else:
        xa_ref, xb_ref, g_ref, z_ref, coef_ref, o_ref, xs_ref, dz_ref = refs

    # Grid is (ci, co, n, ht): the (n, ht) sweep INNERMOST keeps every
    # revisit of the accumulating output block consecutive. With channel
    # blocks innermost (4+ output blocks cycling through the double-buffered
    # output windows) accumulation silently corrupted on-chip — interpret
    # mode models persistent buffers and cannot catch this.
    b = pl.program_id(2)
    i = pl.program_id(3)
    cib = xs_ref.shape[-1]
    cob = dz_ref.shape[-1]
    w_out = dz_ref.shape[1]

    def stage_x(raw, rows0, nrows):
        if not prologue:
            xs_ref[rows0 : rows0 + nrows] = raw
            return
        a = pro_ref[0][None, None, :]
        c = pro_ref[1][None, None, :]
        v = jnp.maximum(raw.astype(jnp.float32) * a + c, 0.0)
        m = jax.lax.broadcasted_iota(jnp.int32, (nrows, raw.shape[1], 1), 0)
        row_g = i * th + rows0 + m - 1
        colm = jax.lax.broadcasted_iota(jnp.int32, (nrows, raw.shape[1], 1), 1) - 1
        ok = (row_g >= 0) & (row_g < h) & (colm >= 0) & (colm < w_img)
        xs_ref[rows0 : rows0 + nrows] = jnp.where(ok, v, 0.0).astype(xs_ref.dtype)

    stage_x(xa_ref[0], 0, th)
    stage_x(xb_ref[0, :2], th, 2)

    al = coef_ref[0][None, None, :]
    be = coef_ref[1][None, None, :]
    gm = coef_ref[2][None, None, :]
    dz = al * g_ref[0].astype(jnp.float32) + be * z_ref[0].astype(jnp.float32) + gm
    valid = jax.lax.broadcasted_iota(jnp.int32, (th, w_out, 1), 0) + i * th < h
    dz_ref[...] = jnp.where(valid, dz, 0.0).astype(dz_ref.dtype)

    @pl.when((b == 0) & (i == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    dz2 = dz_ref[...].reshape(th * w_out, cob)

    # Taps statically unrolled: a TRACED ky in `o_ref[ky, kx] +=` (dynamic
    # leading-index read-modify-write on the output ref) miscompiles on
    # Mosaic — interpret mode matched, on-chip conv2.w grads were garbage
    # (round-2 diag). Unlike the conv kernels, dw's per-tap temporaries are
    # small ((TH·W, cib) ≤ ~0.6 MB), so 9-way unroll fits VMEM.
    for ky in range(3):
        for kx in range(3):
            patch = xs_ref[ky : ky + th, kx : kx + w_out, :]
            o_ref[ky, kx] += jax.lax.dot_general(
                patch.reshape(th * w_out, cib), dz2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.partial(
    jax.jit, static_argnames=("tile_h", "cin_block", "cout_block")
)
def conv3x3_dw(
    x: jax.Array,
    g: jax.Array,
    z: jax.Array,
    coef: jax.Array,  # [3, Cout] fp32 — dz affine, as in conv3x3_dx
    in_scale: jax.Array | None = None,
    in_bias: jax.Array | None = None,
    *,
    tile_h: int = 8,
    cin_block: int | None = None,
    cout_block: int | None = None,
):
    """dw [3,3,Cin,Cout] fp32: patch-grad correlation with on-the-fly
    operands (forward prologue re-applied to x; dz affine from g, z)."""
    n, h, w_img, cin = x.shape
    cout = g.shape[-1]
    prologue = in_scale is not None

    crop_cin = None
    if cin < 8:
        pad_c = 8 - cin
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        if prologue:
            in_scale = jnp.pad(in_scale, (0, pad_c))
            in_bias = jnp.pad(in_bias, (0, pad_c))
        crop_cin = cin
        cin = 8

    th = min(tile_h, h)
    ht = -(-h // th)
    cib = cin_block or min(cin, 256)
    cob = cout_block or min(cout, 256)
    if cin % cib or cout % cob:
        raise ValueError(f"{cin}%{cib} or {cout}%{cob} != 0")

    xp = jnp.pad(x, ((0, 0), (1, (ht + 1) * th - h - 1), (1, 1), (0, 0)))
    padg = ((0, 0), (0, ht * th - h), (0, 0), (0, 0))
    gp = jnp.pad(g, padg)
    zp = jnp.pad(z, padg)
    wp = w_img + 2

    in_specs = [
        pl.BlockSpec((1, th, wp, cib), lambda ci, co, b, i: (b, i, 0, ci),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, wp, cib), lambda ci, co, b, i: (b, i + 1, 0, ci),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xp, xp]
    if prologue:
        pro = jnp.stack(
            [in_scale.astype(jnp.float32), in_bias.astype(jnp.float32)]
        )
        in_specs.append(
            pl.BlockSpec((2, cib), lambda ci, co, b, i: (0, ci),
                         memory_space=pltpu.VMEM)
        )
        operands.append(pro)
    in_specs += [
        pl.BlockSpec((1, th, w_img, cob), lambda ci, co, b, i: (b, i, 0, co),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, w_img, cob), lambda ci, co, b, i: (b, i, 0, co),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cob), lambda ci, co, b, i: (0, co),
                     memory_space=pltpu.VMEM),
    ]
    operands += [gp, zp, coef]

    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, th=th, prologue=prologue, h=h, w_img=w_img),
        grid=(cin // cib, cout // cob, n, ht),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, 3, cib, cob), lambda ci, co, b, i: (0, 0, ci, co),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cib), x.dtype),
            pltpu.VMEM((th, w_img, cob), g.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            # Stack temporaries (staging casts, stats epilogue, tap
            # copies) exceed the default 16 MB scoped-VMEM budget at the
            # U-Net's full-res shapes (measured 16.7 MB at 576x572x64
            # bf16); v5e has 128 MB physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * ht * th * w_img * cin * cout,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize * 2
                + (gp.size + zp.size) * gp.dtype.itemsize
                + 9 * cin * cout * 4
            ),
            transcendentals=0,
        ),
    )(*operands)
    if crop_cin is not None:
        out = out[:, :, :crop_cin]
    return out
