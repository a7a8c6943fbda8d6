"""Inference-specialized forward: BN folded into conv scale/bias.

In eval mode BatchNorm is a per-channel affine with frozen stats, so every
Conv→BN→ReLU of the reference's DoubleConv (SURVEY.md §2 #1) collapses to
conv + scale·x+bias + ReLU. Folding happens ONCE at load time; the forward
then runs either through XLA (which fuses the epilogue into the conv) or
through the Pallas fused kernel (tpu_unet/kernels/fused_conv.py), selected by
``backend=`` — the reference's cuDNN tier replaced by our own MXU kernels.

Numerics match ``unet_apply(..., train=False)`` to fp32 tolerance
(tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_unet.models.unet import Params, State, UNetConfig
from tpu_unet.ops import (
    conv2d,
    conv_transpose2d,
    max_pool2d,
    pad_to_match,
    upsample2x_align_corners,
)

BN_EPS = 1e-5


def _fold_affine(w, bn_p, bn_s):
    """One Conv(no bias)→BN pair → (w, scale, bias) eval affine."""
    gamma = bn_p["scale"].astype(jnp.float32)
    beta = bn_p["bias"].astype(jnp.float32)
    scale = gamma * jax.lax.rsqrt(bn_s.var + BN_EPS)
    return {"w": w, "scale": scale, "bias": beta - bn_s.mean * scale}


def fold_bn(params: Params, state: State, config: UNetConfig) -> Params:
    """Fold BN (γ, β, μ, σ²) into per-conv (w, scale, bias) for inference.

    Supports the flagship U-Net and the attention family (whose gate
    projections are also Conv→BN pairs). UNet++ keeps per-node dense-skip
    state and is served through ``unet_apply(train=False)`` instead — a
    clear refusal here beats a silent wrong-keys walk.
    """
    if config.arch not in ("unet", "attention"):
        raise ValueError(
            f"fold_bn/unet_infer_apply support arch='unet'/'attention', not "
            f"arch={config.arch!r}; serve/predict that family through the "
            "standard unet_apply eval path")

    def fold_double_conv(p, s):
        return {
            f"conv{i}": _fold_affine(p[f"conv{i}"]["w"], p[f"bn{i}"],
                                     s[f"bn{i}"])
            for i in ("1", "2")
        }

    folded: Params = {"inc": fold_double_conv(params["inc"], state["inc"])}
    for i in range(1, 5):
        folded[f"down{i}"] = fold_double_conv(params[f"down{i}"], state[f"down{i}"])
    for i in range(1, 5):
        blk = {"conv": fold_double_conv(params[f"up{i}"]["conv"], state[f"up{i}"]["conv"])}
        if not config.bilinear:
            blk["up"] = params[f"up{i}"]["up"]
        if config.arch == "attention":
            ap, as_ = params[f"up{i}"]["att"], state[f"up{i}"]["att"]
            blk["att"] = {
                k: _fold_affine(ap[k]["w"], ap[f"bn_{bn}"], as_[f"bn_{bn}"])
                for k, bn in (("wg", "g"), ("wx", "x"), ("psi", "psi"))
            }
        folded[f"up{i}"] = blk
    folded["outc"] = params["outc"]
    return folded


def _fused_conv(x, cw, *, backend):
    if backend == "pallas":
        from tpu_unet.kernels.fused_conv import fused_conv3x3_scale_relu

        return fused_conv3x3_scale_relu(x, cw["w"], cw["scale"], cw["bias"])
    h = conv2d(x, cw["w"], stride=1, padding=1)
    h = h * cw["scale"] + cw["bias"]
    return jax.nn.relu(h).astype(x.dtype)


def _affine_1x1(x, cw):
    """Folded 1x1 Conv→BN (no activation): the attention-gate projections."""
    h = conv2d(x, cw["w"], stride=1, padding=0)
    return (h * cw["scale"] + cw["bias"]).astype(x.dtype)


def _gated_skip(skip, up, att):
    """skip * sigmoid(psi(relu(wg(up) + wx(skip)))), all BN-folded."""
    a = jax.nn.relu(_affine_1x1(up, att["wg"]) + _affine_1x1(skip, att["wx"]))
    return skip * jax.nn.sigmoid(_affine_1x1(a, att["psi"]))


def _double_conv(x, p, *, backend):
    if backend == "pallas":
        from tpu_unet.kernels.fused_double_conv import (
            FUSED_DC_MAX_CHANNELS,
            fused_double_conv,
        )

        cin = p["conv1"]["w"].shape[2]
        cmid = p["conv1"]["w"].shape[3]
        if max(cin, cmid) <= FUSED_DC_MAX_CHANNELS:
            return fused_double_conv(
                x,
                p["conv1"]["w"], p["conv1"]["scale"], p["conv1"]["bias"],
                p["conv2"]["w"], p["conv2"]["scale"], p["conv2"]["bias"],
            )
    return _fused_conv(_fused_conv(x, p["conv1"], backend=backend), p["conv2"], backend=backend)


@functools.partial(jax.jit, static_argnames=("config", "backend", "compute_dtype"))
def unet_infer_apply(
    folded: Params,
    x: jax.Array,
    *,
    config: UNetConfig,
    backend: str = "xla",
    compute_dtype=None,
) -> jax.Array:
    """Eval-mode forward on folded params. x: [N,H,W,C] → logits fp32."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        folded = jax.tree.map(lambda p: p.astype(compute_dtype), folded)

    if config.arch == "attention" and backend == "pallas":
        raise ValueError("the Pallas fused-inference tier is wired for the "
                         "flagship U-Net only; use backend='xla' for "
                         "arch='attention'")
    if backend == "pallas":
        from tpu_unet.kernels.pooling import max_pool2x2 as pool
    else:
        pool = max_pool2d

    dc = functools.partial(_double_conv, backend=backend)
    x1 = dc(x, folded["inc"])
    x2 = dc(pool(x1), folded["down1"])
    x3 = dc(pool(x2), folded["down2"])
    x4 = dc(pool(x3), folded["down3"])
    x5 = dc(pool(x4), folded["down4"])

    h = x5
    for i, skip in zip(range(1, 5), (x4, x3, x2, x1)):
        blk = folded[f"up{i}"]
        if config.bilinear:
            up = upsample2x_align_corners(h)
        else:
            up = conv_transpose2d(h, blk["up"]["w"], stride=2)
            up = (up + blk["up"]["b"].astype(jnp.float32)).astype(h.dtype)
        up = pad_to_match(up, skip)
        if config.arch == "attention":
            skip = _gated_skip(skip, up, blk["att"])
        if backend == "pallas":
            # Fused skip-concatenation: the decoder's first conv reads both
            # sources directly — the concat tensor never exists in HBM.
            from tpu_unet.kernels.fused_conv import fused_conv3x3_concat_scale_relu

            c1 = blk["conv"]["conv1"]
            h = fused_conv3x3_concat_scale_relu(
                skip, up, c1["w"], c1["scale"], c1["bias"]
            )
            h = _fused_conv(h, blk["conv"]["conv2"], backend=backend)
        else:
            h = dc(jnp.concatenate([skip, up], axis=-1), blk["conv"])

    logits = conv2d(h, folded["outc"]["w"], stride=1, padding=0)
    return (logits + folded["outc"]["b"].astype(jnp.float32)).astype(jnp.float32)
