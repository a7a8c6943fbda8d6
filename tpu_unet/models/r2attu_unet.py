"""R2AttU-Net (recurrent residual blocks + attention-gated skips) — a
fifth model family.

Beyond-reference capability: the reference ships only the classic U-Net
(SURVEY.md §2). R2AttU-Net is the combination Alom et al. propose alongside
R2U-Net (arXiv:1802.06955, §3; the reference implementations pair it with
the Oktay et al. additive gate of arXiv:1804.03999): every DoubleConv is
replaced by a recurrent residual RRCNN block, and every skip connection is
gated by the decoder feature before concatenation.

This module is pure composition — the RRCNN block comes from
``models/r2u_unet.py`` and the additive attention gate from
``models/attention_unet.py``, both already TPU-native (statically unrolled
weight-shared convs for the MXU; 1x1-conv gates that XLA fuses into the
surrounding convs). Only the decoder wiring (upsample → gate skip →
concat → RRCNN) is new.

Same structure as the other families: NHWC pytrees, functional BN state,
pure apply, both decoder modes (bilinear / ConvTranspose). Tensor
parallelism: like R2U-Net, the RRCNN blocks shard with the Megatron pair
mapped onto the two recurrent units (parallel/tensor.py); the gate
projections stay replicated. The tiler treats the receptive field exactly
like R2U-Net's: the gates are 1x1 convs and add no spatial extent
(parallel/tiling.py min_halo).

Select with ``UNetConfig(arch="r2attu")`` / ``--arch r2attu``; ``recur_t``
sets the recurrence depth, as for R2U-Net.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_unet.models.attention_unet import _gate_apply, _gate_init
from tpu_unet.models.r2u_unet import _rrcnn_apply, _rrcnn_init
from tpu_unet.models.unet import Params, State, UNetConfig, _conv_init
from tpu_unet.ops import (
    conv2d,
    conv_transpose2d,
    max_pool2d,
    pad_to_match,
    upsample2x_align_corners,
)


def init_r2attu_unet(
    key: jax.Array, config: UNetConfig, dtype=jnp.float32
) -> tuple[Params, State]:
    """Classic U-Net channel plan, RRCNN blocks, one gate per skip."""
    c = config.base_channels
    factor = 2 if config.bilinear else 1
    keys = jax.random.split(key, 14)
    params: Params = {}
    state: State = {}
    # Per-application BN statistics by default (config.recur_bn docstring,
    # models/unet.py); None selects the shared torch-parity layout.
    steps = config.recur_t + 1 if config.recur_bn == "per_step" else None

    params["inc"], state["inc"] = _rrcnn_init(
        keys[0], config.n_channels, c, dtype=dtype, steps=steps)
    down_channels = [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c),
                     (8 * c, 16 * c // factor)]
    for i, (cin, cout) in enumerate(down_channels, start=1):
        params[f"down{i}"], state[f"down{i}"] = _rrcnn_init(
            keys[i], cin, cout, dtype=dtype, steps=steps)

    up_specs = [  # (in_channels, out_channels), as in models/unet.py
        (16 * c // factor, 8 * c // factor),
        (8 * c // factor, 4 * c // factor),
        (4 * c // factor, 2 * c // factor),
        (2 * c // factor, c),
    ]
    for i, (cin, cout) in enumerate(up_specs, start=1):
        kup, kconv = jax.random.split(keys[4 + i])
        skip = [8 * c, 4 * c, 2 * c, c][i - 1]
        if config.bilinear:
            g_ch = cin  # upsample keeps channels
            conv_p, conv_s = _rrcnn_init(kconv, skip + cin, cout, dtype=dtype,
                                         steps=steps)
            p = {"conv": conv_p}
            s = {"conv": conv_s}
        else:
            g_ch = cin // 2  # ConvTranspose halves channels
            wkey, bkey = jax.random.split(kup)
            bound = 1.0 / ((g_ch * 2 * 2) ** 0.5)
            p = {"up": {
                "w": jax.random.uniform(wkey, (2, 2, cin, g_ch), dtype,
                                        -bound, bound),
                "b": jax.random.uniform(bkey, (g_ch,), dtype, -bound, bound),
            }}
            conv_p, conv_s = _rrcnn_init(kconv, skip + g_ch, cout, dtype=dtype,
                                         steps=steps)
            p["conv"] = conv_p
            s = {"conv": conv_s}
        p["att"], s["att"] = _gate_init(keys[9 + i], g_ch, skip, dtype=dtype)
        params[f"up{i}"], state[f"up{i}"] = p, s

    params["outc"] = _conv_init(keys[9], 1, 1, c, config.n_classes,
                                bias=True, dtype=dtype)
    return params, state


def _r2attu_up_apply(params, state, x1, x2, *, bilinear: bool, t: int,
                     train: bool, axis_name=None):
    """Upsample x1 → gate skip x2 by it → concat [gated, x1] → RRCNN."""
    if bilinear:
        x1 = upsample2x_align_corners(x1)
    else:
        up = conv_transpose2d(x1, params["up"]["w"], stride=2)
        x1 = (up + params["up"]["b"].astype(jnp.float32)).astype(x1.dtype)
    x1 = pad_to_match(x1, x2)
    gated, att_state = _gate_apply(params["att"], state["att"], x1, x2,
                                   train=train, axis_name=axis_name)
    x = jnp.concatenate([gated, x1], axis=-1)
    out, conv_state = _rrcnn_apply(params["conv"], state["conv"], x, t=t,
                                   train=train, axis_name=axis_name)
    return out, {"att": att_state, "conv": conv_state}


def r2attu_unet_apply(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    config: UNetConfig,
    train: bool = False,
    compute_dtype=None,
    remat: bool = False,
    axis_name: str | None = None,
) -> tuple[jax.Array, State]:
    """Forward: [N,H,W,C] → logits [N,H,W,n_classes], fp32."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    t = config.recur_t
    rr = functools.partial(_rrcnn_apply, t=t, train=train, axis_name=axis_name)
    up = functools.partial(_r2attu_up_apply, bilinear=config.bilinear, t=t,
                           train=train, axis_name=axis_name)
    if remat:
        rr = jax.checkpoint(rr)
        up = jax.checkpoint(up)

    new_state: State = {}
    x1, new_state["inc"] = rr(params["inc"], state["inc"], x)
    x2, new_state["down1"] = rr(params["down1"], state["down1"], max_pool2d(x1))
    x3, new_state["down2"] = rr(params["down2"], state["down2"], max_pool2d(x2))
    x4, new_state["down3"] = rr(params["down3"], state["down3"], max_pool2d(x3))
    x5, new_state["down4"] = rr(params["down4"], state["down4"], max_pool2d(x4))

    h, new_state["up1"] = up(params["up1"], state["up1"], x5, x4)
    h, new_state["up2"] = up(params["up2"], state["up2"], h, x3)
    h, new_state["up3"] = up(params["up3"], state["up3"], h, x2)
    h, new_state["up4"] = up(params["up4"], state["up4"], h, x1)

    logits = conv2d(h, params["outc"]["w"], stride=1, padding=0)
    logits = logits + params["outc"]["b"].astype(jnp.float32)
    return logits.astype(jnp.float32), new_state
