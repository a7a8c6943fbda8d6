"""Multi-host (multi-process) data-parallel training.

The reference is strictly single-process (SURVEY.md §1: "no communication
layer, no multi-process runtime"). On real TPU pods every host drives its
own slice of chips and JAX programs are launched SPMD — one process per
host, `jax.distributed.initialize()` to form the global runtime, and every
jit sees the GLOBAL device mesh while each process can only feed its own
addressable shards. This module is that runtime layer:

  * ``initialize(coordinator, num_processes, process_id)`` — wraps
    ``jax.distributed.initialize``; with no arguments it auto-detects the
    cluster environment (the normal TPU-pod path, where the TPU runtime
    publishes coordinator/process info).
  * ``MultiHostBatches`` — the input-pipeline half: every process computes
    the SAME global shuffle (same seed), loads only ITS rows of each global
    batch from local storage, and assembles the global batch array with
    ``jax.make_array_from_process_local_data`` — no host ever materializes
    (or ships) another host's data. The result feeds the standard GSPMD
    train step unchanged: the step is already written against the global
    mesh, so the SAME compiled program runs on every host.

Validated end-to-end by tests/test_multihost.py: two real OS processes ×
4 virtual CPU devices each (Gloo collectives over localhost) train the real
train_model and reproduce the single-process 8-device loss history.
"""

from __future__ import annotations

import logging

import numpy as np

import jax

logger = logging.getLogger(__name__)


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Form the global multi-process JAX runtime.

    Call BEFORE any other JAX API touches devices. With all arguments None
    this auto-detects the cluster (TPU pods, GKE); explicit arguments are
    for manual clusters (and the CPU-mesh tests)."""
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    logger.info(
        "multihost: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, W&B, progress bars)."""
    return jax.process_index() == 0


class MultiHostBatches:
    """Re-iterable globally-sharded batches for the multi-host trainer.

    Every process iterates the same global batch sequence (identical seed →
    identical permutation), loads its own ``global_batch / process_count``
    rows, and yields GLOBAL jax.Arrays laid out by ``sharding``. Trailing
    batches that don't divide ``process_count × batch`` are dropped (and
    logged once) — all processes must agree on every batch's shape.
    """

    def __init__(self, dataset, indices, batch_size: int, sharding, *,
                 shuffle: bool = False, seed: int = 0):
        if batch_size % jax.process_count():
            raise ValueError(
                f"multihost batch size {batch_size} must divide evenly over "
                f"{jax.process_count()} processes"
            )
        self.dataset = dataset
        # A list, shuffled exactly like data.prefetch.DataLoader shuffles its
        # list — the multihost loss history must be comparable seed-for-seed
        # with the single-process loader's.
        self.indices = [int(i) for i in indices]
        self.batch_size = batch_size
        self.sharding = sharding
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        n_drop = len(self.indices) % batch_size
        if n_drop:
            logger.warning(
                "multihost loader drops a trailing partial batch of %d "
                "samples each epoch (all processes must agree on batch "
                "shapes)", n_drop,
            )

    def __len__(self):
        return len(self.indices) // self.batch_size

    def __iter__(self):
        order = list(self.indices)
        if self.shuffle:
            # Same reseeding scheme as data.prefetch.DataLoader — and, load-
            # bearing, the SAME permutation on every process.
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
            self.epoch += 1
        from concurrent.futures import ThreadPoolExecutor

        from tpu_unet.data.prefetch import collate

        bs = self.batch_size
        local_bs = bs // jax.process_count()
        lo = jax.process_index() * local_bs

        def build(i):
            mine = order[i + lo : i + lo + local_bs]
            local = collate([self.dataset[int(j)] for j in mine])
            return {
                k: jax.make_array_from_process_local_data(self.sharding, v)
                for k, v in local.items()
            }

        # One-batch-ahead host prefetch: the decode/collate/H2D of batch k+1
        # overlaps the device compute of batch k (the single-host path gets
        # the same overlap from prefetch_to_device; without it the TPU would
        # idle through ~300 ms/image host decode at reference scale).
        starts = list(range(0, len(order) - bs + 1, bs))
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = None
            for i in starts:
                nxt = pool.submit(build, i)
                if fut is not None:
                    yield fut.result()
                fut = nxt
            if fut is not None:
                yield fut.result()
