"""R2U-Net (recurrent residual conv blocks) — a fourth model family.

Beyond-reference capability: the reference ships only the classic U-Net
(SURVEY.md §2); R2U-Net (Alom et al., arXiv:1802.06955) keeps the U-Net
encoder/decoder topology but replaces every DoubleConv with a *recurrent
residual* block (RRCNN):

    x  = conv1x1(x_in)                      # channel-setting projection
    h  = RecBlock(RecBlock(x))              # two stacked recurrent units
    out = x + h                             # residual

where one RecBlock applies a SINGLE shared (3x3 conv → BN → ReLU) unit
recurrently with input injection, the de-facto standard formulation
(t unrolled applications after the seeding pass):

    h = unit(x); repeat t times: h = unit(x + h)

The recurrence is unrolled statically (t is a config constant, default 2),
so XLA sees a fixed graph of weight-SHARED convs — on TPU this is the MXU-
friendly form (no dynamic loop, weight reuse amortizes the HBM reads of the
conv kernels across t+1 applications). The shared BN's running statistics
thread through the applications in order, like calling one torch module
repeatedly.

Same TPU-native structure as the other families: NHWC pytrees, functional
BN state, pure apply, both decoder modes (bilinear / ConvTranspose).
Tensor parallelism: parallel/tensor.py maps the Megatron pairing onto the
two recurrent units (rec1 on Cout, rec2 on Cin) — params and fp32
optimizer state land 1/tp per chip, with GSPMD deriving the
per-application resharding of the recurrent activations from the weight
specs alone (tests/test_tensor_parallel.py).

Select with ``UNetConfig(arch="r2u")`` / ``--arch r2u``; ``recur_t`` sets
the recurrence depth.
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


def _rec_unit_init(key, ch: int, dtype=jnp.float32, steps: int | None = None):
    """One shared (3x3 conv → BN → ReLU) unit, applied recurrently.

    ``steps`` = t+1 per-application BN statistics (config.recur_bn
    "per_step"); None = one shared running-stats tree (the "shared" torch
    formulation). Weights, γ, β are shared either way.
    """
    params = {
        "conv": _conv_init(key, 3, 3, ch, ch, bias=False, dtype=dtype),
        "bn": init_bn_params(ch, dtype),
    }
    if steps is None:
        return params, {"bn": init_bn_state(ch)}
    return params, {f"bn{i}": init_bn_state(ch) for i in range(steps)}


def _rec_unit_apply(params, state, x, *, t: int, train: bool, axis_name=None):
    """h = unit(x); then t times h = unit(x + h), sharing weights.

    BN statistics follow the STATE LAYOUT (so torch-oracle pytrees built
    with a single "bn" exercise the parity formulation unchanged): a
    "bn" key = the shared form, its running stats threaded through the
    t+1 applications in order; "bn0".."bnt" = per-application statistics
    (arXiv:1603.09025) — application i normalizes with ITS OWN running
    mean/var at eval, fixing the eval-mode collapse the shared form shows
    when the per-application activation distributions diverge (the
    iterations see genuinely different inputs: x vs x+h)."""

    def unit(v, bn_state):
        h = conv2d(v, params["conv"]["w"], stride=1, padding=1)
        h, bn_state = batch_norm(h.astype(v.dtype), params["bn"], bn_state,
                                 train=train, axis_name=axis_name)
        return jax.nn.relu(h), bn_state

    if "bn" in state:  # shared statistics (torch-parity formulation)
        h, bn = unit(x, state["bn"])
        for _ in range(t):
            h, bn = unit(x + h, bn)
        return h, {"bn": bn}

    h, bn0 = unit(x, state["bn0"])
    new_state = {"bn0": bn0}
    for i in range(1, t + 1):
        h, bni = unit(x + h, state[f"bn{i}"])
        new_state[f"bn{i}"] = bni
    return h, new_state


def _rrcnn_init(key, cin: int, cout: int, dtype=jnp.float32,
                steps: int | None = None):
    k0, k1, k2 = jax.random.split(key, 3)
    params = {
        "proj": _conv_init(k0, 1, 1, cin, cout, bias=True, dtype=dtype),
    }
    state: State = {}
    params["rec1"], state["rec1"] = _rec_unit_init(k1, cout, dtype, steps=steps)
    params["rec2"], state["rec2"] = _rec_unit_init(k2, cout, dtype, steps=steps)
    return params, state


def _rrcnn_apply(params, state, x, *, t: int, train: bool, axis_name=None):
    x = conv2d(x, params["proj"]["w"], stride=1, padding=0)
    x = (x + params["proj"]["b"].astype(jnp.float32)).astype(x.dtype)
    h, s1 = _rec_unit_apply(params["rec1"], state["rec1"], x, t=t,
                            train=train, axis_name=axis_name)
    h, s2 = _rec_unit_apply(params["rec2"], state["rec2"], h, t=t,
                            train=train, axis_name=axis_name)
    return x + h, {"rec1": s1, "rec2": s2}


def init_r2u_unet(
    key: jax.Array, config: UNetConfig, dtype=jnp.float32
) -> tuple[Params, State]:
    """The classic U-Net channel plan with RRCNN blocks for every conv pair."""
    c = config.base_channels
    factor = 2 if config.bilinear else 1
    keys = jax.random.split(key, 10)
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
            conv_p, conv_s = _rrcnn_init(kconv, skip + cin, cout, dtype=dtype,
                                         steps=steps)
            p = {"conv": conv_p}
            s = {"conv": conv_s}
        else:
            wkey, bkey = jax.random.split(kup)
            half = cin // 2
            bound = 1.0 / ((half * 2 * 2) ** 0.5)
            p = {"up": {
                "w": jax.random.uniform(wkey, (2, 2, cin, half), dtype,
                                        -bound, bound),
                "b": jax.random.uniform(bkey, (half,), dtype, -bound, bound),
            }}
            conv_p, conv_s = _rrcnn_init(kconv, skip + half, cout, dtype=dtype,
                                         steps=steps)
            p["conv"] = conv_p
            s = {"conv": conv_s}
        params[f"up{i}"], state[f"up{i}"] = p, s

    params["outc"] = _conv_init(keys[9], 1, 1, c, config.n_classes,
                                bias=True, dtype=dtype)
    return params, state


def _r2u_up_apply(params, state, x1, x2, *, bilinear: bool, t: int,
                  train: bool, axis_name=None):
    """Upsample x1, pad to skip x2, concat [x2, x1], RRCNN."""
    if bilinear:
        x1 = upsample2x_align_corners(x1)
    else:
        up = conv_transpose2d(x1, params["up"]["w"], stride=2)
        x1 = (up + params["up"]["b"].astype(jnp.float32)).astype(x1.dtype)
    x1 = pad_to_match(x1, x2)
    x = jnp.concatenate([x2, x1], axis=-1)
    out, conv_state = _rrcnn_apply(params["conv"], state["conv"], x, t=t,
                                   train=train, axis_name=axis_name)
    return out, {"conv": conv_state}


def r2u_unet_apply(
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
    up = functools.partial(_r2u_up_apply, bilinear=config.bilinear, t=t,
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
