"""Device mesh helpers for GSPMD data-parallel training.

The reference has no distributed code at all (SURVEY.md §2.2–2.3); the
TPU-native scale-out is a 1-D ``jax.sharding.Mesh`` over the chips with the
batch sharded on axis 'data'. XLA inserts the gradient psum over ICI — no
hand-written collectives in the train step.

BatchNorm note: under GSPMD jit the batch statistics are computed over the
GLOBAL batch (XLA lowers the mean over the sharded axis to a collective) —
i.e. DP training is mathematically identical to single-device training at the
same global batch, which is exactly the invariance tests/test_parallel.py
asserts. This is stronger than torch-DDP's per-replica BN and is what makes
DP scaling bit-consistent here.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
