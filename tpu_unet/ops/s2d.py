"""Space-to-depth reformulation of the full-resolution DoubleConv levels.

MFU experiment (VERDICT r2 next #4): the 572²·C64 encoder/decoder levels are
~50% of the train step at ~21% conv efficiency — the MXU starves at C=64
(the contraction dim is 9·64 = 576 but the spatial tiling at 572² leaves the
systolic array underfed; the profile shows the 286²·C256 regime ~2.4× more
efficient per FLOP). This module recasts a stride-1 3×3 conv on [N,H,W,C] as
FOUR phase convs on the 2×2 space-to-depth tensor [N,H/2,W/2,4C]:

  output phase (a,b) at cell (i,j) = rows 2i+a−1..2i+a+1 of the original —
  which span exactly two s2d cells ({i−1,i} for a=0, {i,i+1} for a=1). So
  each phase is ONE 2×2 conv over 4C input channels with per-phase SAME_LO /
  SAME_HI padding, whose kernel is the original w scattered by
  u = 2P + p − (1−a), v = 2Q + q − (1−b). Zero-padding at the image border
  coincides exactly with the original conv's padding=1, so the
  reformulation is bit-exact up to fp reassociation (tests/test_s2d.py).

FLOP cost: 4 phases × (H/2·W/2) × (2·2·4C) × K = 16·HW·C·K vs the original
9·HW·C·K — 1.78× more MAC work, traded for a 4× deeper contraction
(16C = 1024 at C=64) that the MXU can actually tile. Whether that trade wins
is an empirical go/no-go measured by bench.py on the real chip
(BENCH_NOTES.md records the outcome either way).

BatchNorm in s2d domain: channel (p,q,c) is the same logical channel c at a
different spatial phase, so batch statistics must reduce ACROSS phases —
ops/batchnorm.batch_norm(phases=4) sums the per-(phase,c) sibling
reductions into per-c stats and tiles γ/β/μ/σ² back across phases (running
state stays [C], checkpoint-compatible).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tpu_unet.ops.batchnorm import batch_norm
from tpu_unet.ops.conv import _preferred

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def space_to_depth(x: jax.Array) -> jax.Array:
    """[N,H,W,C] -> [N,H/2,W/2,4C], phase-major channels ((p·2+q)·C + c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [N,h,w,p,q,C]
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(y: jax.Array) -> jax.Array:
    """Inverse of space_to_depth: [N,h,w,4C] -> [N,2h,2w,C]."""
    n, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # [N,h,p,w,q,C]
    return y.reshape(n, 2 * h, 2 * w, c)


def s2d_kernel(w: jax.Array, a: int, b: int) -> jax.Array:
    """Original 3×3 kernel [3,3,Cin,K] -> phase-(a,b) s2d kernel [2,2,4Cin,K].

    W[P,Q,(p·2+q)·Cin+c, k] = w[u,v,c,k] with u = 2P+p−(1−a),
    v = 2Q+q−(1−b) when 0 ≤ u,v ≤ 2, else 0. Built with static Python
    loops — traced once per jit, 16 scatter-sets on a (2,2,4Cin,K) zeros.
    """
    kh, kw, cin, k = w.shape
    assert (kh, kw) == (3, 3), "s2d transform is for stride-1 3x3 convs"
    out = jnp.zeros((2, 2, 4 * cin, k), w.dtype)
    for P in (0, 1):
        for Q in (0, 1):
            for p in (0, 1):
                for q in (0, 1):
                    u = 2 * P + p - (1 - a)
                    v = 2 * Q + q - (1 - b)
                    if 0 <= u <= 2 and 0 <= v <= 2:
                        ch = (p * 2 + q) * cin
                        out = out.at[P, Q, ch : ch + cin, :].set(w[u, v])
    return out


def conv2d_s2d(xs: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 3×3 SAME conv, computed in s2d domain.

    xs: [N,h,w,4Cin] (phase-major s2d of the original input);
    w: the ORIGINAL [3,3,Cin,K] kernel. Returns [N,h,w,4K] — the s2d of the
    original conv's output. fp32 accumulation like ops/conv.conv2d."""
    phases = []
    for a in (0, 1):
        for b in (0, 1):
            wab = s2d_kernel(w, a, b)
            pad = ((1 - a, a), (1 - b, b))
            phases.append(
                lax.conv_general_dilated(
                    xs, wab, window_strides=(1, 1), padding=pad,
                    dimension_numbers=DN,
                    # fp32 accumulation for fp32 inputs only — for bf16 the
                    # MXU accumulates fp32 in hardware, and an fp32 OUTPUT
                    # would break autodiff's transpose rule (ops/conv.py).
                    preferred_element_type=_preferred(xs, jnp.float32),
                )
            )
    return jnp.concatenate(phases, axis=-1)


def double_conv_s2d(params, state, x, *, train: bool, axis_name=None,
                    first_plain: bool = False):
    """DoubleConv (conv-BN-ReLU ×2) computed entirely in s2d domain.

    Drop-in for models/unet._double_conv_apply on even-H/W inputs: same
    params/state trees, same running-stat semantics (stats reduced across
    phases), output returned in the original layout.

    ``first_plain`` keeps conv1 in the original domain (s2d'ing its output
    instead) — for inc, whose conv1 has 3 input channels: its s2d form has
    a 2·2·12 = 48 contraction, even more MXU-starved than the original."""
    if first_plain:
        from tpu_unet.ops.conv import conv2d

        h = conv2d(x, params["conv1"]["w"], stride=1, padding=1)
        h, bn1 = batch_norm(h.astype(x.dtype), params["bn1"], state["bn1"],
                            train=train, axis_name=axis_name)
        h = space_to_depth(jax.nn.relu(h))
    else:
        xs = space_to_depth(x)
        h = conv2d_s2d(xs, params["conv1"]["w"])
        h, bn1 = batch_norm(h.astype(x.dtype), params["bn1"], state["bn1"],
                            train=train, axis_name=axis_name, phases=4)
        h = jax.nn.relu(h)
    h = conv2d_s2d(h, params["conv2"]["w"])
    h, bn2 = batch_norm(h.astype(x.dtype), params["bn2"], state["bn2"],
                        train=train, axis_name=axis_name, phases=4)
    h = jax.nn.relu(h)
    return depth_to_space(h), {"bn1": bn1, "bn2": bn2}
