"""Device-resident dataset: the whole corpus staged to HBM once, batches
gathered on device.

Why (measured, BENCH_NOTES.md round 2): at the reference's 959×640 training
resolution the end-to-end trainer is INPUT-bound — host decode first
(~300 ms/image, fixed by the RAM cache) and then per-batch H2D transfer
(~98 MB/batch as float32+int64). With the corpus resident in HBM as uint8,
the per-step host→device traffic is the index vector (~32 bytes); batch
assembly is an XLA gather fused with the /255 normalize, and the trainer
runs at device speed.

Capacity: Carvana at the reference's scale 0.5 (5088 images, 480×320)
stages ~2.4 GB uint8 + 0.8 GB masks against the v5e's 16 GB HBM.

Parity: samples are taken from the SAME ``BasicDataset.preprocess`` output
(decode → PIL resize → /255 → mask palette indexing). Images are re-staged
as uint8 only when ``preprocessed·255`` round-trips exactly (true whenever
the /255 rule fired, i.e. for every uint8 source image); otherwise the
stage falls back to float32 with a log line. ``uint8/255`` on device is
then bit-identical to the host float pipeline. Masks stage as uint8
(class indices; requires < 256 classes) and are served as int32.

Multi-chip: pass ``data_sharding`` (corpus rows laid out over the mesh's
'data' axis) and ``out_sharding`` (the trainer's batch sharding) — the
jitted gather then runs under GSPMD and XLA inserts the all-to-all that
routes each shuffled sample to the device that owns its batch slot. On a
real pod this matters even more than single-chip: one host pipe feeding N
chips is N× more input-bound. Usage: ``train.py --device-dataset``
(composes with ``--data-parallel``) or ``DeviceResidentData(ds)``.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


# 256-entry table of the host pipeline's EXACT float32 values: XLA lowers
# x/255.0 to multiply-by-reciprocal, which is 1 ulp off numpy's true
# division for ~85% of byte values — a table gather keeps the device batch
# bit-identical to the host DataLoader (asserted in tests).
_U8_TABLE = np.arange(256, dtype=np.float32) / 255.0


@jax.jit
def _gather_u8(imgs, masks, idx):
    x = jnp.asarray(_U8_TABLE)[imgs[idx].astype(jnp.int32)]
    return x, masks[idx].astype(jnp.int32)


@jax.jit
def _gather_f32(imgs, masks, idx):
    return imgs[idx], masks[idx].astype(jnp.int32)


def _local_row_range(sharding, global_shape) -> tuple[int, int]:
    """The contiguous [lo, hi) row range this process's devices own under a
    leading-dim sharding (standard process-major mesh order)."""
    spans = []
    for dev, idx in sharding.devices_indices_map(tuple(global_shape)).items():
        if dev.process_index != jax.process_index():
            continue
        lo, hi, _ = idx[0].indices(global_shape[0])
        spans.append((lo, hi))
    # Dedupe: devices along replicated mesh axes (e.g. 'spatial' when rows
    # shard only over 'data') own the same row block.
    spans = sorted(set(spans))
    lo = spans[0][0]
    hi = spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != hi - lo:
        raise ValueError(
            "process-local corpus rows are not contiguous under this mesh "
            "layout; multi-host --device-dataset needs a process-major "
            f"'data' axis (got spans {spans})"
        )
    return lo, hi


class _Batches:
    """Re-iterable view over device-gathered batches (evaluate() re-iterates
    the val split at every validation — 5×/epoch)."""

    def __init__(self, parent: "DeviceResidentData", indices, batch_size,
                 shuffle, seed, drop_last):
        self.parent = parent
        self.indices = np.asarray(indices, np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = self.indices.copy()
        if self.shuffle:
            # Same per-epoch reseeding scheme as data.prefetch.DataLoader.
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
            self.epoch += 1
        bs = self.batch_size
        for i in range(0, len(order), bs):
            b = order[i : i + bs]
            if self.drop_last and len(b) < bs:
                break
            gather = self.parent._gather
            if (self.parent._gather_fallback is not None
                    and not self.parent._batch_shardable(len(b))):
                gather = self.parent._gather_fallback
            # Pass the index vector as a HOST array: jit replicates it, which
            # under multi-host is exactly the "same value on every process"
            # contract (a jnp.asarray here would commit it to local devices
            # and be rejected next to the global corpus operands).
            x, m = gather(self.parent._images, self.parent._masks, b)
            yield {"image": x, "mask": m}


class DeviceResidentData:
    """Stage ``dataset`` (already-preprocessed samples) into HBM once.

    ``data_sharding``: optional NamedSharding laying the corpus rows over
    the mesh (rows are padded to a multiple of the shard count; pad rows
    are never indexed). ``out_sharding``: optional batch sharding for the
    gathered output — makes the gather a GSPMD program whose result feeds
    the DP train step directly.
    """

    def __init__(self, dataset, num_workers: int = 8,
                 data_sharding=None, out_sharding=None):
        n = len(dataset)
        first = dataset[0]
        h, w, c = first["image"].shape
        multihost = data_sharding is not None and jax.process_count() > 1
        if data_sharding is not None:
            shards = int(np.prod(list(data_sharding.mesh.shape.values())))
            pad = (-n) % shards
            plen = n + pad
        if multihost:
            # Multi-host: each process loads and stages ONLY the corpus
            # rows its local devices own under ``data_sharding`` — no host
            # ever decodes (or holds) another host's shard. Padded rows
            # (plen > n) repeat the corpus cyclically, matching the
            # single-host pad convention; they are never indexed.
            lo, hi = _local_row_range(data_sharding, (plen, h, w, c))
            src = [(r if r < n else (r - n) % n) for r in range(lo, hi)]
        else:
            src = list(range(n))
        imgs = np.empty((len(src), h, w, c), np.float32)
        masks_i = np.empty((len(src), h, w), np.int64)

        def fill(j):
            s = dataset[src[j]]
            imgs[j] = s["image"]
            masks_i[j] = s["mask"]

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            list(pool.map(fill, range(len(src))))

        if masks_i.max() >= 256:
            raise ValueError(
                "device-resident masks stage as uint8 (<256 classes); got "
                f"max class index {int(masks_i.max())}"
            )
        # Chunked uint8 round-trip check: a whole-corpus np.rint(imgs*255)
        # plus its /255 comparison would hold TWO extra float copies of the
        # corpus (~3× host RAM at Carvana scale, ~28 GB); 64-sample slabs
        # keep the transient O(slab).
        u8 = np.empty(imgs.shape, np.uint8)
        exact = True
        for sl_lo in range(0, len(src), 64):
            sl = imgs[sl_lo : sl_lo + 64]
            r = np.rint(sl * 255.0)
            if not np.array_equal(r / 255.0, sl):
                exact = False
                break
            u8[sl_lo : sl_lo + 64] = r.astype(np.uint8)
        stage_imgs = u8 if exact else imgs
        del u8
        stage_masks = masks_i.astype(np.uint8)
        if multihost:
            # The uint8-exactness decision must agree on every process (a
            # mixed decision would trace different gather programs and
            # deadlock) — each process only sees its rows, so require the
            # exact path outright; it holds for every uint8-sourced image.
            if not exact:
                # A bare assert would vanish under python -O, and a mixed
                # per-process decision would trace DIFFERENT gather programs
                # and deadlock the distributed runtime with no diagnostic.
                raise ValueError(
                    "multi-host --device-dataset requires the uint8 "
                    "round-trip (preprocessed values must be k/255) — "
                    "float-typed sources are single-host only"
                )
            self._images = jax.make_array_from_process_local_data(
                data_sharding, stage_imgs)
            self._masks = jax.make_array_from_process_local_data(
                data_sharding, stage_masks)
        elif data_sharding is not None:
            if pad:
                # Repeat rows cyclically: pad may exceed n for tiny corpora
                # on wide meshes (a plain [:pad] slice would under-pad and
                # the device_put below would fail divisibility). Pad rows
                # are never indexed by real batches.
                rep = np.arange(pad) % n
                stage_imgs = np.concatenate([stage_imgs, stage_imgs[rep]])
                stage_masks = np.concatenate([stage_masks, stage_masks[rep]])
            self._images = jax.device_put(stage_imgs, data_sharding)
            self._masks = jax.device_put(stage_masks, data_sharding)
        else:
            self._images = jnp.asarray(stage_imgs)
            self._masks = jnp.asarray(stage_masks)
        self._sample_hw = (h, w, c)
        base = _gather_u8.__wrapped__ if exact else _gather_f32.__wrapped__
        plain = _gather_u8 if exact else _gather_f32
        if out_sharding is not None:
            self._gather = jax.jit(base, out_shardings=(out_sharding, out_sharding))
            # Batches that don't divide the mesh (e.g. the val split's
            # trailing batch — no drop_last) can't take the sharded-output
            # gather; they fall back to the plain jit (their odd batch shape
            # needs its own compile anyway).
            self._gather_fallback = plain
            self._out_sharding = out_sharding
        else:
            self._gather = plain
            self._gather_fallback = None
            self._out_sharding = None
        mb = self._images.nbytes / 1e6 + self._masks.nbytes / 1e6
        logger.info(
            "Device-resident dataset: %d samples %dx%d staged to HBM "
            "(%.0f MB as %s%s)", n, h, w, mb,
            "uint8" if exact else "float32",
            ", sharded" if data_sharding is not None else "",
        )

    def _batch_shardable(self, n_batch: int) -> bool:
        """True when a gathered batch of this size divides the out_sharding
        mesh (image AND mask shapes)."""
        h, w, c = self._sample_hw
        try:
            self._out_sharding.shard_shape((n_batch, h, w, c))
            self._out_sharding.shard_shape((n_batch, h, w))
            return True
        except Exception:
            return False

    def batches(self, indices: Sequence[int], batch_size: int, *,
                shuffle: bool = False, seed: int = 0,
                drop_last: bool = False) -> _Batches:
        return _Batches(self, indices, batch_size, shuffle, seed, drop_last)
