"""ZeRO-1 optimizer-state sharding over the data axis (GSPMD).

The reference trains on one GPU and has no distributed code (SURVEY.md
§2.2); this is the TPU-native counterpart of DeepSpeed/FSDP "stage 1":
under plain data parallelism the fp32 RMSprop trees (square_avg +
momentum_buf = 2 × 4 bytes × params ≈ 248 MB for the 31M flagship) are the
largest REPLICATED per-chip allocation after activations. ZeRO-1 shards
both trees over the 'data' mesh axis so each chip holds 1/N of the
optimizer state, while params/grads stay replicated (the activation math is
untouched).

TPU-native design — no hand-written collectives: the state arrays are
*placed* sharded (``jax.device_put`` with per-leaf ``NamedSharding``) and
the train step pins the updated state to the same shardings with
``with_sharding_constraint``. XLA then partitions the elementwise optimizer
update over the axis and inserts exactly one all-gather for the param
delta per step (the classic ZeRO-1 collective), riding ICI.

Sharding rule per leaf: the LAST dimension divisible by the axis size —
conv kernels [3,3,Cin,Cout] shard on Cout, BN scale/bias [C] on C, the 1×1
head [1,1,C,n_classes] on Cin; leaves with no divisible dim (e.g. the
head's [n_classes] bias) stay replicated — correctness never depends on the
sharding, so odd shapes degrade to plain DP semantics instead of erroring.

Numerics: the update itself is elementwise, but pinning the state shardings
lets GSPMD reduce-scatter the weight gradients instead of all-reducing them
(the efficient ZeRO dataflow), which regroups the fp32 reduction — results
match the replicated step to round-off (~1e-6 relative, same contract as
FSDP vs DDP), pinned by
tests/test_parallel.py::test_zero_sharded_opt_state_matches_plain_dp.

Composition: rides the ('data',) and ('data','spatial') meshes.
``--tensor-parallel`` already shards the state over 'model'
(parallel/tensor.py::shard_opt_state); composing both axes is possible but
not wired — tp targets the same memory term.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def zero_state_specs(params, n: int, axis: str = "data"):
    """PartitionSpec pytree (structure of ``params``): last divisible dim
    of each leaf sharded over ``axis``; no divisible dim → replicated."""

    def leaf(p):
        for d in reversed(range(p.ndim)):
            if p.shape[d] % n == 0:
                spec = [None] * p.ndim
                spec[d] = axis
                return P(*spec)
        return P()

    return jax.tree.map(leaf, params)


def zero_opt_shardings(mesh: Mesh, opt_state, params, axis: str = "data"):
    """NamedSharding pytree matching ``opt_state``. State fields that mirror
    the params tree leaf-for-leaf get the 1/N shardings; any other field
    (e.g. Adam's scalar ``step`` counter, optim/optimizers.py) is replicated
    — sharding a scalar is meaningless and correctness never depends on it."""
    specs = zero_state_specs(params, mesh.shape[axis], axis)
    ptreedef = jax.tree.structure(params)

    def field_shardings(tree):
        if jax.tree.structure(tree) == ptreedef:
            return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)

    return type(opt_state)(*(field_shardings(t) for t in opt_state))


def shard_opt_state_zero(mesh: Mesh, opt_state, params, axis: str = "data"):
    """Place the fp32 optimizer state sharded over ``axis`` (1/N per chip)."""
    shardings = zero_opt_shardings(mesh, opt_state, params, axis)
    return jax.tree.map(jax.device_put, opt_state, shardings)
