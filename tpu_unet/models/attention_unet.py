"""Attention U-Net (gated skip connections) — a third model family.

Beyond-reference capability: the reference ships only the classic U-Net
(SURVEY.md §2); Attention U-Net (Oktay et al., arXiv:1804.03999) keeps the
U-Net encoder/decoder but GATES each skip connection with additive
attention before concatenation — the decoder's (upsampled) feature is the
gating signal g, the encoder skip is x, and

    att(g, x) = x * sigmoid(BN(psi(relu(BN(W_g g) + BN(W_x x)))))

with W_g/W_x/psi all 1x1 convs (the widely-used formulation with
batch-norm after every projection; F_int = skip_channels // 2). The gate
is pure elementwise+1x1 work, so XLA fuses it into the surrounding convs
— on TPU it adds ~3% params and negligible step time at the C=64 level.

Same TPU-native structure as the flagship: NHWC pytrees, functional BN
state, pure apply, jit-friendly static graph. Shares DoubleConv and the
encoder/decoder channel plan with models/unet.py; both decoder modes
(bilinear upsample and ConvTranspose) are supported, mirroring the
reference's ``bilinear`` switch.

Select with ``UNetConfig(arch="attention")`` / ``--arch attention``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_unet.models.unet import (
    Params,
    State,
    UNetConfig,
    _conv_init,
    _double_conv_apply,
    _double_conv_init,
)
from tpu_unet.ops import (
    batch_norm,
    conv2d,
    conv_transpose2d,
    init_bn_params,
    init_bn_state,
    max_pool2d,
    pad_to_match,
    upsample2x_align_corners,
)


def _gate_init(key, g_ch: int, x_ch: int, dtype=jnp.float32):
    """Additive attention gate: W_g (g_ch→f), W_x (x_ch→f), psi (f→1)."""
    f_int = max(1, x_ch // 2)
    kg, kx, kp = jax.random.split(key, 3)
    params = {
        "wg": _conv_init(kg, 1, 1, g_ch, f_int, bias=False, dtype=dtype),
        "bn_g": init_bn_params(f_int, dtype),
        "wx": _conv_init(kx, 1, 1, x_ch, f_int, bias=False, dtype=dtype),
        "bn_x": init_bn_params(f_int, dtype),
        "psi": _conv_init(kp, 1, 1, f_int, 1, bias=False, dtype=dtype),
        "bn_psi": init_bn_params(1, dtype),
    }
    state = {
        "bn_g": init_bn_state(f_int),
        "bn_x": init_bn_state(f_int),
        "bn_psi": init_bn_state(1),
    }
    return params, state


def _gate_apply(params, state, g, x, *, train: bool, axis_name=None):
    """x gated by g (both at x's spatial size): x * sigmoid(psi(relu(...)))."""
    hg = conv2d(g, params["wg"]["w"], stride=1, padding=0)
    hg, bn_g = batch_norm(hg.astype(g.dtype), params["bn_g"], state["bn_g"],
                          train=train, axis_name=axis_name)
    hx = conv2d(x, params["wx"]["w"], stride=1, padding=0)
    hx, bn_x = batch_norm(hx.astype(x.dtype), params["bn_x"], state["bn_x"],
                          train=train, axis_name=axis_name)
    a = jax.nn.relu(hg + hx)
    a = conv2d(a, params["psi"]["w"], stride=1, padding=0)
    a, bn_psi = batch_norm(a.astype(x.dtype), params["bn_psi"],
                           state["bn_psi"], train=train, axis_name=axis_name)
    a = jax.nn.sigmoid(a)
    return x * a, {"bn_g": bn_g, "bn_x": bn_x, "bn_psi": bn_psi}


def init_attention_unet(
    key: jax.Array, config: UNetConfig, dtype=jnp.float32
) -> tuple[Params, State]:
    """The classic U-Net channel plan + one attention gate per skip."""
    c = config.base_channels
    factor = 2 if config.bilinear else 1
    keys = jax.random.split(key, 14)
    params: Params = {}
    state: State = {}

    params["inc"], state["inc"] = _double_conv_init(
        keys[0], config.n_channels, c, dtype=dtype)
    down_channels = [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c),
                     (8 * c, 16 * c // factor)]
    for i, (cin, cout) in enumerate(down_channels, start=1):
        params[f"down{i}"], state[f"down{i}"] = _double_conv_init(
            keys[i], cin, cout, dtype=dtype)

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
            conv_p, conv_s = _double_conv_init(
                kconv, skip + cin, cout, (skip + cin) // 2, dtype=dtype)
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
            conv_p, conv_s = _double_conv_init(
                kconv, skip + g_ch, cout, dtype=dtype)
            p["conv"] = conv_p
            s = {"conv": conv_s}
        p["att"], s["att"] = _gate_init(keys[9 + i], g_ch, skip, dtype=dtype)
        params[f"up{i}"], state[f"up{i}"] = p, s

    params["outc"] = _conv_init(keys[9], 1, 1, c, config.n_classes,
                                bias=True, dtype=dtype)
    return params, state


def _att_up_apply(params, state, x1, x2, *, bilinear: bool, train: bool,
                  axis_name=None):
    """Upsample x1 → gate skip x2 by it → concat [gated, x1] → DoubleConv."""
    if bilinear:
        x1 = upsample2x_align_corners(x1)
    else:
        up = conv_transpose2d(x1, params["up"]["w"], stride=2)
        x1 = (up + params["up"]["b"].astype(jnp.float32)).astype(x1.dtype)
    x1 = pad_to_match(x1, x2)
    gated, att_state = _gate_apply(params["att"], state["att"], x1, x2,
                                   train=train, axis_name=axis_name)
    x = jnp.concatenate([gated, x1], axis=-1)
    out, conv_state = _double_conv_apply(
        params["conv"], state["conv"], x, train=train, axis_name=axis_name)
    return out, {"att": att_state, "conv": conv_state}


def attention_unet_apply(
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

    dc = functools.partial(_double_conv_apply, train=train,
                           axis_name=axis_name)
    up = functools.partial(_att_up_apply, bilinear=config.bilinear,
                           train=train, axis_name=axis_name)
    if remat:
        dc = jax.checkpoint(dc)
        up = jax.checkpoint(up)

    new_state: State = {}
    x1, new_state["inc"] = dc(params["inc"], state["inc"], x)
    x2, new_state["down1"] = dc(params["down1"], state["down1"], max_pool2d(x1))
    x3, new_state["down2"] = dc(params["down2"], state["down2"], max_pool2d(x2))
    x4, new_state["down3"] = dc(params["down3"], state["down3"], max_pool2d(x3))
    x5, new_state["down4"] = dc(params["down4"], state["down4"], max_pool2d(x4))

    h, new_state["up1"] = up(params["up1"], state["up1"], x5, x4)
    h, new_state["up2"] = up(params["up2"], state["up2"], h, x3)
    h, new_state["up3"] = up(params["up3"], state["up3"], h, x2)
    h, new_state["up4"] = up(params["up4"], state["up4"], h, x1)

    logits = conv2d(h, params["outc"]["w"], stride=1, padding=0)
    logits = logits + params["outc"]["b"].astype(jnp.float32)
    return logits.astype(jnp.float32), new_state
