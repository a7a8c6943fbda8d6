"""conv_stats: the train-path fused conv unit (custom_vjp over Pallas).

One op covers every 3×3 conv of the reference's Conv→BN→ReLU chains
(reference: unet/unet_parts.py DoubleConv, UNVERIFIED mount, SURVEY.md §2
#1) in TRAIN mode:

    z, (Σz, Σz²) = conv_stats(x, w[, a, c])
      ≡ z = conv3x3_same(relu(x·a + c), w);  Σ over the batch-spatial axes

i.e. the PREVIOUS BatchNorm's normalize+ReLU rides the conv's input
staging (prologue) and THIS conv's batch statistics ride its epilogue —
the two diagnosed MFU leaks of the XLA train path (separate stat-reduction
and normalize passes over every activation; tools/bench_experiments.py).

Differentiation strategy: the op exposes the RAW SUMS (Σz, Σz²) as a
primal output, and the mean/var finalization (÷m, −mean²) happens in plain
differentiable JAX outside the custom_vjp. The sum cotangents (gΣ, gΣ²)
then collapse into a per-channel affine dz = gz + 2·gΣ²·z + gΣ, which the
backward kernels build on the fly (kernels/train_conv.py): dz never exists
in HBM, and the relu/affine prologue backward is a single fused XLA
elementwise+reduction pass. No monolithic hand-derived DoubleConv backward
needed.

Exposing sums rather than (mean, var) buys two things: the backward
coefficients are independent of the element count m, and cross-device
data parallelism becomes a plain ``lax.psum`` of the [2, C] sums INSIDE
autodiff but OUTSIDE the kernel — the psum transpose distributes the
cotangents back to every device, so the same kernels serve single-device
and shard_map-DP training with GLOBAL batch statistics (matching the XLA
GSPMD path's semantics, parallel/mesh.py).

``double_conv_train_fused`` assembles the reference DoubleConv from two
conv_stats calls + tiny XLA glue, including torch-parity running-stat
updates (biased batch var for normalize, unbiased for the buffer).

Caveat (documented divergence): batch variance here is the one-pass
E[z²] − E[z]² from the kernel's (Σz, Σz²) epilogue, while ops/batchnorm.py
uses the two-pass form. For BN inputs (conv outputs, near-zero mean) the
cancellation error is far below bf16 resolution; parity is asserted in
tests/test_train_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpu_unet.kernels.train_conv import conv3x3_dw, conv3x3_dx, conv3x3_fwd
from tpu_unet.ops.batchnorm import BNState

BN_EPS = 1e-5


def _dz_coef(gs):
    """dz = α·gz + β·z + γ from the SUM cotangents gs = (gΣ, gΣ²); α ≡ 1."""
    beta = 2.0 * gs[1]
    gamma = gs[0]
    alpha = jnp.ones_like(beta)
    return jnp.stack([alpha, beta, gamma])


# -- raw variant: no input prologue (encoder inputs, decoder concats) -------


def _make_conv_stats_raw(compute_dx: bool):
    @jax.custom_vjp
    def op(x, w):
        return conv3x3_fwd(x, w, stats=True)  # z, [2, Cout] (Σz, Σz²)

    def fwd(x, w):
        z, s = conv3x3_fwd(x, w, stats=True)
        return (z, s), (x, w, z)

    def bwd(res, cot):
        x, w, z = res
        gz, gs = cot
        gz = gz.astype(z.dtype)
        coef = _dz_coef(gs)
        dw = conv3x3_dw(x, gz, z, coef).astype(w.dtype)
        if compute_dx:
            dx = conv3x3_dx(gz, z, coef, w, out_dtype=x.dtype)
        else:
            # First layer: the image has no cotangent consumer; skip the
            # whole transposed conv (XLA DCEs this too on its own path).
            dx = jnp.zeros_like(x)
        return dx, dw

    op.defvjp(fwd, bwd)
    return op


conv_stats_raw = _make_conv_stats_raw(compute_dx=True)
conv_stats_raw_nodx = _make_conv_stats_raw(compute_dx=False)


# -- prologue variant: input is a RAW conv output + its normalize affine ----


@jax.custom_vjp
def conv_stats_pro(x, w, a, c):
    return conv3x3_fwd(x, w, a, c, stats=True)


def _pro_fwd(x, w, a, c):
    z, s = conv3x3_fwd(x, w, a, c, stats=True)
    return (z, s), (x, w, a, c, z)


def _pro_bwd(res, cot):
    x, w, a, c, z = res
    gz, gs = cot
    gz = gz.astype(z.dtype)
    coef = _dz_coef(gs)
    # Cotangent of h = relu(x·a + c) — the transposed conv (Pallas).
    dh = conv3x3_dx(gz, z, coef, w, out_dtype=jnp.float32)
    dw = conv3x3_dw(x, gz, z, coef, a, c).astype(w.dtype)
    # Prologue backward: one fused XLA elementwise + per-channel reductions.
    xf = x.astype(jnp.float32)
    af = a.astype(jnp.float32)
    mask = (xf * af + c.astype(jnp.float32)) > 0
    dhm = jnp.where(mask, dh, 0.0)
    dx = (dhm * af).astype(x.dtype)
    da = jnp.sum(dhm * xf, axis=(0, 1, 2)).astype(a.dtype)
    dc = jnp.sum(dhm, axis=(0, 1, 2)).astype(c.dtype)
    return dx, dw, da, dc


conv_stats_pro.defvjp(_pro_fwd, _pro_bwd)


# -- the reference DoubleConv in train mode, fully fused ---------------------


def double_conv_train_fused(
    params,
    state,
    x: jax.Array,
    *,
    input_needs_grad: bool = True,
    momentum: float = 0.1,
    eps: float = BN_EPS,
    axis_name: str | None = None,
):
    """(conv3×3 → BN(train) → ReLU) × 2 on the fused kernels.

    Semantics match models/unet._double_conv_apply(train=True): biased batch
    var normalizes, unbiased updates the running buffers (torch parity).
    With ``axis_name`` (shard_map data parallelism) the [2, C] stat sums are
    psum'd across the axis, giving GLOBAL batch statistics — the same
    semantics the XLA path gets implicitly under GSPMD (parallel/mesh.py).
    Returns (y, {"bn1": BNState, "bn2": BNState}).
    """
    m = x.shape[0] * x.shape[1] * x.shape[2]
    if axis_name is not None:
        m = m * lax.psum(1, axis_name)

    def finalize(s):
        if axis_name is not None:
            s = lax.psum(s, axis_name)
        mean = s[0] / m
        # Clamped like ops/batchnorm.py: fp32 cancellation can dip slightly
        # negative for near-constant channels, and rsqrt would NaN.
        var = jnp.maximum(s[1] / m - mean * mean, 0.0)
        return mean, var

    conv1 = conv_stats_raw if input_needs_grad else conv_stats_raw_nodx

    z1, s1 = conv1(x, params["conv1"]["w"])
    mu1, var1 = finalize(s1)
    g1 = params["bn1"]["scale"].astype(jnp.float32)
    b1 = params["bn1"]["bias"].astype(jnp.float32)
    inv1 = g1 * jax.lax.rsqrt(var1 + eps)
    a1, c1 = inv1, b1 - mu1 * inv1

    z2, s2 = conv_stats_pro(z1, params["conv2"]["w"], a1, c1)
    mu2, var2 = finalize(s2)
    g2 = params["bn2"]["scale"].astype(jnp.float32)
    b2 = params["bn2"]["bias"].astype(jnp.float32)
    inv2 = g2 * jax.lax.rsqrt(var2 + eps)
    y = jnp.maximum(
        z2.astype(jnp.float32) * inv2 + (b2 - mu2 * inv2), 0.0
    ).astype(x.dtype)

    def running(old: BNState, mean, var) -> BNState:
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        unbiased = var * (m / max(m - 1, 1))
        return BNState(
            mean=(1 - momentum) * old.mean + momentum * mean,
            var=(1 - momentum) * old.var + momentum * unbiased,
        )

    new_state = {
        "bn1": running(state["bn1"], mu1, var1),
        "bn2": running(state["bn2"], mu2, var2),
    }
    return y, new_state
