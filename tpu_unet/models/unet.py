"""U-Net, TPU-native functional form.

Capability parity with the reference model (reference: unet/unet_model.py —
UNet, unet/unet_parts.py — DoubleConv/Down/Up/OutConv; UNVERIFIED mount, see
SURVEY.md §0/§2 #1–#5):

  * inc = DoubleConv(n_ch, 64); down1..4 → 128/256/512/(1024//factor) with
    factor = 2 if bilinear else 1; up1..4 → 512//f, 256//f, 128//f, 64; outc
    1×1 conv to n_classes. DoubleConv = (3×3 conv, pad 1, no bias → BN →
    ReLU) × 2 with optional mid_channels.
  * bilinear=True decoder: 2× align-corners bilinear upsample +
    DoubleConv(in, out, mid=in//2); else ConvTranspose2d(in, in//2, k=2, s=2)
    + DoubleConv(in, out).
  * Up pads the upsampled tensor to the skip's size (floor/ceil split) then
    concatenates [skip, up] on channels.
  * ``use_checkpointing()`` analog: ``remat=True`` wraps each block in
    ``jax.checkpoint`` (recompute-in-backward), the TPU way to trade FLOPs
    for HBM.

Not a port: the model is a pure function ``unet_apply(params, state, x)`` over
NHWC arrays — params are a pytree, BN running stats are explicit state, and
the whole forward is a single traced XLA program (no Python module dispatch at
run time). AMP is a ``compute_dtype=bfloat16`` cast at the block boundary with
fp32 conv accumulation and fp32 BN statistics, mirroring torch autocast
behavior on the reference.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from tpu_unet.ops import (
    BNState,
    batch_norm,
    conv2d,
    conv_transpose2d,
    init_bn_params,
    init_bn_state,
    max_pool2d,
    pad_to_match,
    upsample2x_align_corners,
)

Params = dict[str, Any]
State = dict[str, Any]


class UNetConfig(NamedTuple):
    n_channels: int = 3
    n_classes: int = 2
    bilinear: bool = False
    base_channels: int = 64
    # "unet" (reference parity) | "unetpp" (models/unetpp.py) |
    # "attention" (models/attention_unet.py) | "r2u" (models/r2u_unet.py) |
    # "r2attu" (models/r2attu_unet.py)
    arch: str = "unet"
    deep_supervision: bool = False  # unetpp only: per-column heads, averaged
    recur_t: int = 2  # r2u/r2attu: recurrence depth of each shared conv unit
    # r2u/r2attu BN statistics across the t+1 weight-shared applications:
    # "per_step" keeps separate running mean/var per application (Cooijmans
    # et al., arXiv:1603.09025 — weights/γ/β stay shared) — the default
    # because the shared-stats form collapses in eval mode once training
    # moves fast (measured r5: adam@3e-4 → train-mode Dice 0.89 vs
    # eval-mode 0.06 on the toy diagnostic; BENCH_NOTES r5). "shared"
    # reproduces the de-facto torch formulation (one BN stepped t+1 times),
    # kept for parity comparison (tests/test_family_oracles.py).
    recur_bn: str = "per_step"
    # MFU experiment (ops/s2d.py): compute the two full-resolution C=64
    # DoubleConv levels (inc, up4) in 2×2 space-to-depth form — same math,
    # 4× deeper MXU contraction, 1.78× the MACs. Numerics-equivalent
    # (tests/test_s2d.py); params/checkpoints unchanged. Off by default.
    s2d_level0: bool = False


# ---------------------------------------------------------------------------
# Initialization (torch-style kaiming-uniform bounds so training dynamics
# match the reference; exact weights are irrelevant — goldens load weights).
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, *, bias: bool, dtype=jnp.float32) -> Params:
    wkey, bkey = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = 1.0 / (fan_in ** 0.5)
    p: Params = {
        "w": jax.random.uniform(wkey, (kh, kw, cin, cout), dtype, -bound, bound)
    }
    if bias:
        p["b"] = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return p


def _double_conv_init(key, cin, cout, cmid=None, dtype=jnp.float32):
    cmid = cout if cmid is None else cmid
    k1, k2 = jax.random.split(key)
    params = {
        "conv1": _conv_init(k1, 3, 3, cin, cmid, bias=False, dtype=dtype),
        "bn1": init_bn_params(cmid, dtype),
        "conv2": _conv_init(k2, 3, 3, cmid, cout, bias=False, dtype=dtype),
        "bn2": init_bn_params(cout, dtype),
    }
    state = {"bn1": init_bn_state(cmid), "bn2": init_bn_state(cout)}
    return params, state


def init_unet(
    key: jax.Array, config: UNetConfig, dtype=jnp.float32
) -> tuple[Params, State]:
    """Build (params, state) pytrees for the model described by ``config``."""
    if config.arch == "unetpp":
        from tpu_unet.models.unetpp import init_unetpp

        return init_unetpp(key, config, dtype)
    if config.arch == "attention":
        from tpu_unet.models.attention_unet import init_attention_unet

        return init_attention_unet(key, config, dtype)
    if config.arch == "r2u":
        from tpu_unet.models.r2u_unet import init_r2u_unet

        return init_r2u_unet(key, config, dtype)
    if config.arch == "r2attu":
        from tpu_unet.models.r2attu_unet import init_r2attu_unet

        return init_r2attu_unet(key, config, dtype)
    c = config.base_channels
    factor = 2 if config.bilinear else 1
    keys = jax.random.split(key, 10)
    params: Params = {}
    state: State = {}

    params["inc"], state["inc"] = _double_conv_init(keys[0], config.n_channels, c, dtype=dtype)
    down_channels = [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c), (8 * c, 16 * c // factor)]
    for i, (cin, cout) in enumerate(down_channels, start=1):
        params[f"down{i}"], state[f"down{i}"] = _double_conv_init(
            keys[i], cin, cout, dtype=dtype
        )

    up_specs = [  # (in_channels, out_channels) per reference channel plan
        (16 * c // factor, 8 * c // factor),
        (8 * c // factor, 4 * c // factor),
        (4 * c // factor, 2 * c // factor),
        (2 * c // factor, c),
    ]
    for i, (cin, cout) in enumerate(up_specs, start=1):
        kup, kconv = jax.random.split(keys[4 + i])
        # Skip channels at this decoder level (encoder output it concats with).
        skip = [8 * c, 4 * c, 2 * c, c][i - 1]
        if config.bilinear:
            # concat(skip, upsampled cin) == reference's nominal in_channels;
            # DoubleConv(in, out, mid=in//2) per unet_parts.Up (UNVERIFIED).
            concat_c = skip + cin
            conv_p, conv_s = _double_conv_init(kconv, concat_c, cout, concat_c // 2, dtype=dtype)
            p = {"conv": conv_p}
            s = {"conv": conv_s}
        else:
            # ConvTranspose2d(cin, cin//2, k=2, s=2); torch fan_in for ConvT
            # weights (Cin, Cout, k, k) is Cout*k*k.
            wkey, bkey = jax.random.split(kup)
            half = cin // 2
            bound = 1.0 / ((half * 2 * 2) ** 0.5)
            up_p = {
                "w": jax.random.uniform(wkey, (2, 2, cin, half), dtype, -bound, bound),
                "b": jax.random.uniform(bkey, (half,), dtype, -bound, bound),
            }
            conv_p, conv_s = _double_conv_init(kconv, skip + half, cout, dtype=dtype)
            p = {"up": up_p, "conv": conv_p}
            s = {"conv": conv_s}
        params[f"up{i}"], state[f"up{i}"] = p, s

    params["outc"] = _conv_init(keys[9], 1, 1, c, config.n_classes, bias=True, dtype=dtype)
    return params, state


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _double_conv_apply(
    params, state, x, *, train: bool, axis_name=None, kernels=None, first=False
):
    if kernels == "pallas" and train:
        # Fused train path: BN stats ride the conv epilogue, normalize+ReLU
        # the next conv's prologue; custom_vjp backward (ops/conv_stats.py).
        # axis_name (shard_map DP) psums the stat sums → global batch stats.
        from tpu_unet.ops.conv_stats import double_conv_train_fused

        return double_conv_train_fused(
            params, state, x, input_needs_grad=not first, axis_name=axis_name
        )
    h = conv2d(x, params["conv1"]["w"], stride=1, padding=1)
    h, bn1 = batch_norm(h.astype(x.dtype), params["bn1"], state["bn1"], train=train, axis_name=axis_name)
    h = jax.nn.relu(h)
    h = conv2d(h, params["conv2"]["w"], stride=1, padding=1)
    h, bn2 = batch_norm(h.astype(x.dtype), params["bn2"], state["bn2"], train=train, axis_name=axis_name)
    h = jax.nn.relu(h)
    return h, {"bn1": bn1, "bn2": bn2}


def _up_apply(
    params, state, x1, x2, *, bilinear: bool, train: bool, axis_name=None,
    kernels=None, s2d=False,
):
    """Decoder block: upsample x1, pad to skip x2, concat [x2, x1], DoubleConv."""
    if bilinear:
        x1 = upsample2x_align_corners(x1)
    else:
        up = conv_transpose2d(x1, params["up"]["w"], stride=2)
        x1 = (up + params["up"]["b"].astype(jnp.float32)).astype(x1.dtype)
    x1 = pad_to_match(x1, x2)
    x = jnp.concatenate([x2, x1], axis=-1)
    if s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        from tpu_unet.ops.s2d import double_conv_s2d

        out, conv_state = double_conv_s2d(
            params["conv"], state["conv"], x, train=train, axis_name=axis_name
        )
    else:
        out, conv_state = _double_conv_apply(
            params["conv"], state["conv"], x, train=train, axis_name=axis_name,
            kernels=kernels,
        )
    return out, {"conv": conv_state}


def unet_apply(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    config: UNetConfig,
    train: bool = False,
    compute_dtype=None,
    remat: bool = False,
    axis_name: str | None = None,
    kernels: str | None = None,
) -> tuple[jax.Array, State]:
    """Forward pass. x: [N,H,W,n_channels] -> logits [N,H,W,n_classes].

    compute_dtype=jnp.bfloat16 is the TPU analog of the reference's --amp
    (autocast): activations/weights in bf16, conv accumulation and BN stats in
    fp32, logits returned in fp32.
    remat=True is the analog of the reference's use_checkpointing() OOM
    fallback: every block recomputes activations in the backward pass.
    kernels="pallas" (train mode) runs every DoubleConv on the fused
    conv+BN-stats Pallas kernels (ops/conv_stats.py). Under data parallelism
    pallas_call is not auto-partitionable by GSPMD, so train_model wraps the
    step in shard_map and passes axis_name — the fused path then psums its
    stat sums for global-batch BN semantics.
    """
    if config.arch in ("unetpp", "attention", "r2u", "r2attu"):
        if kernels:
            # Refuse rather than silently run XLA: the fused Pallas tier is
            # wired for the flagship U-Net's block layout only, and a user
            # benchmarking `--arch unetpp --kernels pallas` must not draw
            # conclusions from the wrong backend.
            raise ValueError("kernels='pallas' is not implemented for "
                             f"arch={config.arch!r}; use the default XLA "
                             "backend")
        if config.arch == "unetpp":
            from tpu_unet.models.unetpp import unetpp_apply

            return unetpp_apply(
                params, state, x, config=config, train=train,
                compute_dtype=compute_dtype, remat=remat,
                axis_name=axis_name,
            )
        if config.arch == "r2u":
            from tpu_unet.models.r2u_unet import r2u_unet_apply

            return r2u_unet_apply(
                params, state, x, config=config, train=train,
                compute_dtype=compute_dtype, remat=remat,
                axis_name=axis_name,
            )
        if config.arch == "r2attu":
            from tpu_unet.models.r2attu_unet import r2attu_unet_apply

            return r2attu_unet_apply(
                params, state, x, config=config, train=train,
                compute_dtype=compute_dtype, remat=remat,
                axis_name=axis_name,
            )
        from tpu_unet.models.attention_unet import attention_unet_apply

        return attention_unet_apply(
            params, state, x, config=config, train=train,
            compute_dtype=compute_dtype, remat=remat, axis_name=axis_name,
        )
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    use_s2d = (config.s2d_level0 and kernels is None
               and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
    dc = functools.partial(
        _double_conv_apply, train=train, axis_name=axis_name, kernels=kernels
    )
    # inc is the only block whose input (the image) needs no cotangent.
    dc_first = functools.partial(dc, first=True)
    up = functools.partial(
        _up_apply, bilinear=config.bilinear, train=train, axis_name=axis_name,
        kernels=kernels,
    )
    # s2d routing is bound BEFORE any jax.checkpoint wrap: a bool passed
    # through the wrapped call would be traced and break the Python branch.
    up_last = functools.partial(up, s2d=use_s2d)
    if use_s2d:
        from tpu_unet.ops.s2d import double_conv_s2d

        # first_plain: inc's conv1 has only n_channels (3) inputs — its s2d
        # form is a 2·2·12-deep contraction, even more MXU-starved than the
        # original (both variants measured ≈0.65× regardless, BENCH_NOTES r3).
        dc_first = functools.partial(
            double_conv_s2d, train=train, axis_name=axis_name, first_plain=True
        )
    if remat:
        dc = jax.checkpoint(dc)
        dc_first = jax.checkpoint(dc_first)
        up = jax.checkpoint(up)
        up_last = jax.checkpoint(up_last)

    new_state: State = {}
    x1, new_state["inc"] = dc_first(params["inc"], state["inc"], x)
    x2, new_state["down1"] = dc(params["down1"], state["down1"], max_pool2d(x1))
    x3, new_state["down2"] = dc(params["down2"], state["down2"], max_pool2d(x2))
    x4, new_state["down3"] = dc(params["down3"], state["down3"], max_pool2d(x3))
    x5, new_state["down4"] = dc(params["down4"], state["down4"], max_pool2d(x4))

    h, new_state["up1"] = up(params["up1"], state["up1"], x5, x4)
    h, new_state["up2"] = up(params["up2"], state["up2"], h, x3)
    h, new_state["up3"] = up(params["up3"], state["up3"], h, x2)
    h, new_state["up4"] = up_last(params["up4"], state["up4"], h, x1)

    logits = conv2d(h, params["outc"]["w"], stride=1, padding=0)
    logits = logits + params["outc"]["b"].astype(jnp.float32)
    return logits.astype(jnp.float32), new_state


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
