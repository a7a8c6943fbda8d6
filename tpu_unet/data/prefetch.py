"""Batching + double-buffered device prefetch.

The reference feeds the GPU with torch DataLoader workers + pin_memory and a
synchronous per-batch ``.to(device)`` H2D copy (SURVEY.md §3.1 — no overlap
beyond pinning). The TPU-native replacement: a thread pool decodes/collates on
host while ``prefetch_to_device`` keeps ``buffer_size`` batches already
resident in HBM, so the H2D DMA of batch k+1 overlaps with the device compute
of batch k. Static batch shapes (drop_last or pad) keep jit cache hits at 1.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Any, Callable, Iterable, Iterator, Sequence

import numpy as np

import jax


def collate(samples: Sequence[dict]) -> dict[str, np.ndarray]:
    """Stack sample dicts into batch arrays (images NHWC, masks NHW).

    Preserves uint8 images (the --device-preprocess path ships raw frames and
    normalizes on device — upcasting here would 4x the H2D transfer bytes);
    anything else is standardized to float32 for the host-preprocessed path.
    """
    imgs = np.stack([s["image"] for s in samples])
    if imgs.dtype != np.uint8:
        imgs = imgs.astype(np.float32)
    masks = np.stack([s["mask"] for s in samples])
    if masks.dtype == np.int64:
        # Class indices are tiny; int64 doubles the H2D bytes for nothing
        # (measured: the relay tunnel's H2D bandwidth binds end-to-end
        # training at 959×640 — BENCH_NOTES.md r2). int32 is value-exact.
        masks = masks.astype(np.int32)
    return {"image": imgs, "mask": masks}


class DataLoader:
    """Minimal epoch iterator over an indexable dataset.

    Parallel sample loading via threads (PIL decode releases the GIL for the
    heavy parts); shuffling is seeded per epoch for reproducibility.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        indices: Sequence[int] | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.indices = list(indices) if indices is not None else list(range(len(dataset)))
        self.epoch = 0

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        order = list(self.indices)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 1:
            for b in batches:
                yield collate([self.dataset[i] for i in b])
            return

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # Pipeline: keep 2 batches in flight behind the consumer.
            pending: collections.deque = collections.deque()

            def submit(idx_batch):
                return [pool.submit(self.dataset.__getitem__, i) for i in idx_batch]

            for b in batches[:2]:
                pending.append(submit(b))
            for k, b in enumerate(batches):
                futures = pending.popleft()
                if k + 2 < len(batches):
                    pending.append(submit(batches[k + 2]))
                yield collate([f.result() for f in futures])


def prefetch_to_device(
    iterator: Iterable[Any], buffer_size: int = 2, sharding=None
) -> Iterator[Any]:
    """Keep ``buffer_size`` batches resident on device ahead of the consumer.

    ``jax.device_put`` is async — the H2D DMA runs while the previous step
    computes; with ``sharding`` the put scatters straight to the mesh.
    """
    queue: collections.deque = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(buffer_size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
