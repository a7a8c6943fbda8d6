"""Tensor (channel) parallelism for the conv families — GSPMD 'model' axis.

The reference has no distributed code (SURVEY.md §2.2); data and spatial
parallelism live in parallel/mesh.py. This module adds the third mesh axis:
**tensor parallelism**, sharding the channel dimension of every DoubleConv
so each device holds 1/tp of the weights, optimizer state, and (between the
two convs of a block) 1/tp of the activations.

TPU-native design — Megatron-style column→row pairing, expressed purely as
GSPMD shardings (no hand-written collectives):

  * ``conv1.w`` [3,3,Cin,Cmid] shards on **Cout** (`P(None,None,None,'model')`)
    → its output activations are channel-sharded; BN1 γ/β and running stats
    shard the same way (BN statistics reduce over N,H,W — per-channel, so a
    channel shard computes its own stats with no cross-device term).
  * ``conv2.w`` [3,3,Cmid,Cout] shards on **Cin** (`P(None,None,'model',None)`)
    → the contraction over the sharded Cmid is partial per device and XLA
    inserts exactly ONE all-reduce per DoubleConv over ICI; BN2 and the
    block output are replicated, so pooling/upsample/concat boundaries need
    no resharding.

  Everything that is not a DoubleConv (transposed-conv upsamplers, 1×1
  output heads, attention-gate projections) is replicated — they are a
  rounding error of the parameter and FLOP budget.

R2U/R2AttU's RRCNN blocks (models/r2u_unet.py) get the same treatment with
the pair mapped onto the two recurrent units: ``rec1.conv`` shards on Cout
(BN1 γ/β/stats with its channels), ``rec2.conv`` on Cin. The units are
weight-SHARED across t+1 applications, so GSPMD additionally derives the
per-application resharding of the recurrent activations (an all-gather
before each rec1 re-application, one all-reduce per rec2 application) from
the same two weight specs — no recurrence-aware code. The 1×1 channel
projection stays replicated. Params and fp32 optimizer state still land
1/tp per chip, which is the point of the axis; the extra per-application
collectives are the cost of recurrence, priced in ICI bandwidth only when
``--tensor-parallel`` is explicitly requested for those families.

This composes with the existing axes: the full mesh is
('data', 'spatial', 'model'), batch sharded over 'data', image height over
'spatial', channels over 'model'. Gradients of replicated params reduce over
'data' exactly as in plain DP (XLA inserts the psums); gradients of sharded
params are themselves sharded — the optimizer update runs shard-local.

When to use: dp×sp already covers the flagship's scaling (activations
dominate a 31M-param convnet). The 'model' axis is for param-/optimizer-
dominated regimes — wide variants (base_channels ≥ 256 quadruples params
16×) where replicated RMSprop state (2 fp32 trees) would not fit per-chip
HBM, or serving many-channel models from a pod slice.

Numerics: sharding the Cmid contraction changes the reduction ORDER of the
conv2 accumulation (partials + one all-reduce), so results match the
single-device program to fp32 round-off, not bitwise —
tests/test_tensor_parallel.py pins the tolerance.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_unet.ops import BNState

_DC_KEYS = {"conv1", "bn1", "conv2", "bn2"}
_RRCNN_KEYS = {"proj", "rec1", "rec2"}


def make_mesh_3d(model: int, spatial: int = 1, n_devices: int | None = None) -> Mesh:
    """('data', 'spatial', 'model') mesh; data axis takes the remainder.

    Axis order puts 'model' innermost: on real slices, consecutive device
    ids are ICI neighbors, and the per-DoubleConv all-reduce (the chattiest
    collective here) then rides the shortest rings.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) % (spatial * model):
        raise ValueError(
            f"{len(devices)} devices not divisible by "
            f"spatial·model = {spatial}·{model}"
        )
    grid = np.array(devices).reshape(-1, spatial, model)
    return Mesh(grid, ("data", "spatial", "model"))


def _is_double_conv_params(node) -> bool:
    return isinstance(node, dict) and _DC_KEYS <= set(node.keys())


def _is_rrcnn_params(node) -> bool:
    return (isinstance(node, dict) and _RRCNN_KEYS <= set(node.keys())
            and isinstance(node.get("rec1"), dict)
            and "conv" in node["rec1"])


def _replicate_tree(tree):
    return jax.tree.map(lambda _: P(), tree)


def unet_param_specs(params, tp: int):
    """PartitionSpec pytree (same structure as ``params``) for the pairing.

    Blocks whose mid-channel count does not divide ``tp`` stay replicated —
    correctness never depends on sharding, so an odd block (e.g. a tiny
    custom base_channels) degrades to DP semantics instead of erroring.
    """

    def walk(node):
        if _is_double_conv_params(node):
            cmid = node["conv1"]["w"].shape[3]
            if cmid % tp:
                return _replicate_tree(node)
            specs = {
                "conv1": {"w": P(None, None, None, "model")},
                "bn1": {"scale": P("model"), "bias": P("model")},
                "conv2": {"w": P(None, None, "model", None)},
                "bn2": {"scale": P(), "bias": P()},
            }
            # DoubleConv never carries extra keys today; tolerate future ones.
            for k in node:
                if k not in specs:
                    specs[k] = _replicate_tree(node[k])
            return specs
        if _is_rrcnn_params(node):
            # RRCNN (r2u/r2attu): the Megatron pair mapped onto the two
            # weight-shared recurrent units — rec1 column-, rec2 row-sharded.
            c = node["rec1"]["conv"]["w"].shape[3]
            if c % tp:
                return _replicate_tree(node)
            specs = {
                "proj": _replicate_tree(node["proj"]),
                "rec1": {"conv": {"w": P(None, None, None, "model")},
                         "bn": {"scale": P("model"), "bias": P("model")}},
                "rec2": {"conv": {"w": P(None, None, "model", None)},
                         "bn": {"scale": P(), "bias": P()}},
            }
            for k in node:
                if k not in specs:
                    specs[k] = _replicate_tree(node[k])
            return specs
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return _replicate_tree(node)

    return walk(params)


def unet_state_specs(state, tp: int):
    """Specs for the BN running-stats tree: bn1 sharded with its channels."""

    def walk(node):
        if (isinstance(node, dict) and {"bn1", "bn2"} <= set(node.keys())
                and isinstance(node["bn1"], BNState)):
            c = node["bn1"].mean.shape[0]
            s1 = P("model") if c % tp == 0 else P()
            return {
                "bn1": BNState(mean=s1, var=s1),
                "bn2": BNState(mean=P(), var=P()),
                **{k: walk(v) for k, v in node.items() if k not in ("bn1", "bn2")},
            }
        if (isinstance(node, dict) and {"rec1", "rec2"} <= set(node.keys())
                and isinstance(node["rec1"], dict)
                and any(isinstance(v, BNState)
                        for v in node["rec1"].values())):
            # RRCNN state: rec1's BN stats shard with rec1.conv's Cout.
            # Both layouts: one shared "bn" tree or per-application
            # "bn0".."bnt" trees (config.recur_bn) — every rec1 stats tree
            # shards on the model axis, every rec2 tree is replicated.
            c = next(v for v in node["rec1"].values()
                     if isinstance(v, BNState)).mean.shape[0]
            s1 = P("model") if c % tp == 0 else P()
            return {
                "rec1": {k: BNState(mean=s1, var=s1) for k in node["rec1"]},
                "rec2": {k: BNState(mean=P(), var=P()) for k in node["rec2"]},
                **{k: walk(v) for k, v in node.items()
                   if k not in ("rec1", "rec2")},
            }
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return _replicate_tree(node)

    return walk(state)


def _place(mesh: Mesh, tree, specs):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def shard_model(mesh: Mesh, params, bn_state):
    """Place (params, bn_state) with the tensor-parallel shardings."""
    tp = mesh.shape["model"]
    return (
        _place(mesh, params, unet_param_specs(params, tp)),
        _place(mesh, bn_state, unet_state_specs(bn_state, tp)),
    )


def shard_opt_state(mesh: Mesh, opt_state, params):
    """The fp32 state trees mirror the params tree — shard them identically,
    so the optimizer update stays shard-local (no gather of the fp32 state
    trees). Non-param-shaped fields (Adam's scalar ``step``,
    optim/optimizers.py) are replicated."""
    tp = mesh.shape["model"]
    specs = unet_param_specs(params, tp)
    ptreedef = jax.tree.structure(params)

    def place_field(tree):
        if jax.tree.structure(tree) == ptreedef:
            return _place(mesh, tree, specs)
        return _place(mesh, tree, jax.tree.map(lambda _: P(), tree))

    return type(opt_state)(*(place_field(t) for t in opt_state))
