"""BatchNorm over NHWC, functional (explicit running-stats state).

Parity target: torch.nn.BatchNorm2d(C) with default eps=1e-5, momentum=0.1
(reference: unet/unet_parts.py — DoubleConv uses Conv→BN→ReLU, UNVERIFIED
mount, SURVEY.md §2 #1).

TPU-first notes: stats reduce over (N,H,W) which XLA lowers to a single fused
reduction on the VPU; the normalize itself is a fused multiply-add that XLA
folds into the producing conv's epilogue. Statistics are always accumulated in
float32 even under bf16 activations (AMP parity with torch autocast, which
keeps BN in fp32).

Design decision (SURVEY.md §7 stage 4): under the production GSPMD trainer
(jit over a Mesh, batch sharded on 'data'), the stats reductions above are
GLOBAL-batch — XLA inserts the cross-replica collectives automatically, so a
DP run matches a single-device run bit-for-bit (tests/test_parallel.py).
``axis_name`` exists only for explicit shard_map/pmap callers, where each
replica traces on its local shard and synced stats must be requested by hand.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BNState(NamedTuple):
    """Running statistics for one BatchNorm layer."""

    mean: jax.Array  # [C]
    var: jax.Array  # [C]


def init_bn_params(c: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def init_bn_state(c: int) -> BNState:
    return BNState(mean=jnp.zeros((c,), jnp.float32), var=jnp.ones((c,), jnp.float32))


def batch_norm(
    x: jax.Array,
    params: dict,
    state: BNState,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
    phases: int = 1,
) -> tuple[jax.Array, BNState]:
    """Apply batch norm. x: [N,H,W,C]. Returns (y, new_state).

    Train mode normalizes by biased batch variance and updates running stats
    with the unbiased variance (torch semantics). Eval mode uses running stats.

    ``phases > 1`` (space-to-depth callers, ops/s2d.py): x's channel dim is
    phase-major [phases·C] where channel (φ, c) is logical channel c at
    spatial phase φ — statistics reduce across phases into per-c values
    (state stays [C]) and γ/β/μ/σ² are tiled back across phases.
    """
    orig_dtype = x.dtype
    if train:
        xf = x.astype(jnp.float32)
        n = x.shape[0] * x.shape[1] * x.shape[2] * phases
        # One-pass statistics: Σx and Σx² are sibling reductions over the
        # same operand, which XLA multi-output-fuses into a SINGLE sweep of
        # the activation — the two-pass E[(x-μ)²] form forces a second full
        # HBM read per BN because the var reduction waits on the completed
        # mean (measured: BN stat reductions were ~14.5% of the 572² train
        # step; tools/bench_experiments.py evalbn_b16, BENCH_NOTES.md r2).
        # The E[x²]−E[x]² cancellation is benign here: BN inputs are conv
        # outputs with |mean| ≲ σ, so the lost precision is far below the
        # bf16 activation resolution (parity asserted vs the two-pass torch
        # oracle in tests/test_model.py / test_train_e2e.py).
        s1 = jnp.sum(xf, axis=(0, 1, 2))
        s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2))
        if phases > 1:
            # Fold the phase-major channel groups: [phases·C] -> [C]. The
            # big (N,H,W) sweep above is unchanged; this is a tiny second
            # reduction over a [phases, C] view.
            s1 = s1.reshape(phases, -1).sum(axis=0)
            s2 = s2.reshape(phases, -1).sum(axis=0)
        if axis_name is not None:
            # Cross-replica sums give global-batch statistics directly
            # (around the global mean, including the between-replica term).
            s1 = jax.lax.psum(s1, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
            n = n * jax.lax.psum(1, axis_name)
        mean = s1 / n
        # Clamp: fp32 cancellation in E[x²]−E[x]² can dip slightly negative
        # for near-constant channels with |mean| >> σ, and rsqrt(var+eps)
        # would then produce NaN. The max fuses into the same elementwise op.
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        # Unbiased variance for the running buffer (torch semantics).
        unbiased = var * (n / max(n - 1, 1))
        new_state = BNState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state

    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps) * scale
    shift = bias - mean * inv
    if phases > 1:
        inv = jnp.tile(inv, phases)
        shift = jnp.tile(shift, phases)
    # One fused multiply-add per element; XLA folds this into the conv epilogue.
    y = x.astype(jnp.float32) * inv + shift
    return y.astype(orig_dtype), new_state
