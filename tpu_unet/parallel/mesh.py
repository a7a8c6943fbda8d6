"""Device mesh helpers for GSPMD data- and spatial-parallel training.

The reference has no distributed code at all (SURVEY.md §2.2–2.3); the
TPU-native scale-out is a ``jax.sharding.Mesh`` over the chips — 1-D with
the batch sharded on axis 'data', or 2-D ('data', 'spatial') with image
height additionally sharded (``make_mesh_2d``). XLA inserts the gradient
psums and the conv halo exchanges over ICI — no hand-written collectives in
the train step.

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


def make_mesh_2d(spatial: int, n_devices: int | None = None) -> Mesh:
    """2-D ('data', 'spatial') mesh: batch-sharded × height-sharded training.

    GSPMD spatially partitions every conv/pool/resize over the 'spatial'
    axis (XLA inserts the halo exchanges over ICI); BN batch statistics stay
    GLOBAL — the H-dim mean reductions lower to collectives exactly like the
    batch-dim ones, so dp×sp training matches single-device training to
    reduction-order tolerance (tests/test_parallel.py asserts it). Use when
    the per-device batch shard would drop below 1 (more chips than batch) or
    when one image's activations exceed a single chip's HBM.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) % spatial:
        raise ValueError(f"{len(devices)} devices not divisible by spatial={spatial}")
    import numpy as np

    grid = np.array(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(grid, ("data", "spatial"))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over 'data' and, if the mesh has it, image height over 'spatial'.

    Works for both images [N,H,W,C] and masks [N,H,W] (trailing dims
    unconstrained → replicated along the remaining axes)."""
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
