"""UNet++ (nested dense skip connections) — a second model family.

Beyond-reference capability: the reference ships only the classic U-Net
(SURVEY.md §2); UNet++ (Zhou et al., arXiv:1912.05074 — retrieved in
PAPERS.md) redesigns the skips as a dense grid of nodes X[i][j] where node
(i, j≥1) convolves the concat of all same-level predecessors X[i][0..j-1]
with the 2× upsampled X[i+1][j-1]. Same TPU-native structure as the U-Net:
NHWC pytrees, functional BN state, align-corners 2× upsample, jit-friendly
static graph. Shares DoubleConv init/apply with models/unet.py.

Select with ``UNetConfig(arch="unetpp")`` (bilinear decoder semantics; the
grid uses upsampling, not transposed convs, per the original design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_unet.models.unet import (
    Params,
    State,
    UNetConfig,
    _double_conv_apply,
    _double_conv_init,
    _conv_init,
)
from tpu_unet.ops import max_pool2d, pad_to_match, upsample2x_align_corners

DEPTH = 5  # levels 0..4, like the reference U-Net


def init_unetpp(key: jax.Array, config: UNetConfig, dtype=jnp.float32):
    c = config.base_channels
    chans = [c * (2 ** i) for i in range(DEPTH)]
    keys = iter(jax.random.split(key, DEPTH * DEPTH + 1))
    params: Params = {}
    state: State = {}

    # Backbone column j=0.
    for i in range(DEPTH):
        cin = config.n_channels if i == 0 else chans[i - 1]
        params[f"x{i}0"], state[f"x{i}0"] = _double_conv_init(
            next(keys), cin, chans[i], dtype=dtype
        )
    # Nested nodes j ≥ 1: input = j·c_i (dense same-level) + c_{i+1} (upsampled).
    for j in range(1, DEPTH):
        for i in range(DEPTH - j):
            cin = j * chans[i] + chans[i + 1]
            params[f"x{i}{j}"], state[f"x{i}{j}"] = _double_conv_init(
                next(keys), cin, chans[i], dtype=dtype
            )

    if config.deep_supervision:
        hkeys = jax.random.split(next(keys), DEPTH - 1)
        for j in range(1, DEPTH):
            params[f"head{j}"] = _conv_init(
                hkeys[j - 1], 1, 1, chans[0], config.n_classes, bias=True, dtype=dtype
            )
    else:
        params["outc"] = _conv_init(
            next(keys), 1, 1, chans[0], config.n_classes, bias=True, dtype=dtype
        )
    return params, state


def unetpp_apply(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    config: UNetConfig,
    train: bool = False,
    compute_dtype=None,
    remat: bool = False,
    axis_name: str | None = None,
):
    """Forward: [N,H,W,C] → logits [N,H,W,n_classes] from node X[0][4]."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    import functools

    dc = functools.partial(_double_conv_apply, train=train, axis_name=axis_name)
    if remat:
        dc = jax.checkpoint(dc)

    nodes: dict[tuple[int, int], jax.Array] = {}
    new_state: State = {}

    h = x
    for i in range(DEPTH):
        if i > 0:
            h = max_pool2d(h)
        h, new_state[f"x{i}0"] = dc(params[f"x{i}0"], state[f"x{i}0"], h)
        nodes[(i, 0)] = h
        h = nodes[(i, 0)]

    for j in range(1, DEPTH):
        for i in range(DEPTH - j):
            up = upsample2x_align_corners(nodes[(i + 1, j - 1)])
            up = pad_to_match(up, nodes[(i, 0)])
            cat = jnp.concatenate(
                [nodes[(i, k)] for k in range(j)] + [up], axis=-1
            )
            nodes[(i, j)], new_state[f"x{i}{j}"] = dc(
                params[f"x{i}{j}"], state[f"x{i}{j}"], cat
            )

    from tpu_unet.ops import conv2d

    if config.deep_supervision:
        # Averaged per-column heads (the paper's "accurate" mode); training
        # through the mean supervises every column.
        heads = []
        for j in range(1, DEPTH):
            p = params[f"head{j}"]
            hj = conv2d(nodes[(0, j)], p["w"], stride=1, padding=0)
            heads.append(hj.astype(jnp.float32) + p["b"].astype(jnp.float32))
        logits = sum(heads) / len(heads)
    else:
        logits = conv2d(nodes[(0, DEPTH - 1)], params["outc"]["w"], stride=1, padding=0)
        logits = logits + params["outc"]["b"].astype(jnp.float32)
    return logits.astype(jnp.float32), new_state
