"""Dataset layer: host-side decode with exact reference preprocess semantics.

Parity targets (reference: utils/data_loading.py — load_image, BasicDataset,
CarvanaDataset, unique_mask_values; UNVERIFIED mount, SURVEY.md §2 #7–#10):

  * ``load_image``: .npy → numpy, .pt/.pth → torch.load → numpy, else PIL.
  * ``BasicDataset``: scans images_dir for ids (splitext of listdir, skips
    dotfiles, asserts non-empty), precomputes sorted-unique mask values over
    every mask with a multiprocessing pool (handles HxW int masks and HxWx3
    RGB masks), __getitem__ loads image+mask by id (exactly one glob match
    each, equal sizes) and returns the preprocessed pair.
  * ``preprocess``: resize to (int(w·scale), int(h·scale)) with NEAREST for
    masks / BICUBIC for images (assert >0 — "Scale is too small"); masks →
    class-index map by matching mask_values; images → float, /255 iff max>1.
    This transform is shared verbatim by training and predict — the
    parity-critical contract (SURVEY.md §2 #9).

Layout divergence (deliberate, documented): the reference emits CHW torch
tensors; this framework is channels-last, so images are HWC float32 and masks
HW int64 numpy arrays — the TPU-native layout, saving a transpose on device.

TPU-first: everything here is host-side numpy/PIL. Batching, device transfer
and double-buffered prefetch live in tpu_unet/data/prefetch.py so decode
overlaps with device compute.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from os import listdir
from os.path import isfile, join, splitext
from pathlib import Path

import numpy as np
from PIL import Image

from tpu_unet import native as native_preproc

logger = logging.getLogger(__name__)


def load_image(filename) -> Image.Image:
    """Extension-dispatched image load, mirroring the reference loader."""
    ext = splitext(str(filename))[1]
    if ext == ".npy":
        return Image.fromarray(np.load(filename))
    elif ext in (".pt", ".pth"):
        import torch

        return Image.fromarray(torch.load(filename).numpy())
    else:
        return Image.open(filename)


def unique_mask_values(idx, mask_dir: Path, mask_suffix: str):
    """Unique pixel values of one mask file (pool worker fn)."""
    mask_file = list(mask_dir.glob(idx + mask_suffix + ".*"))[0]
    mask = native_preproc.asarray_fast(load_image(mask_file))
    if mask.ndim == 2:
        return np.unique(mask)
    elif mask.ndim == 3:
        mask = mask.reshape(-1, mask.shape[-1])
        return np.unique(mask, axis=0)
    else:
        raise ValueError(f"Loaded masks should have 2 or 3 dimensions, found {mask.ndim}")


class BasicDataset:
    """Generic segmentation dataset: paired images/masks matched by id."""

    def __init__(
        self,
        images_dir: str,
        mask_dir: str,
        scale: float = 1.0,
        mask_suffix: str = "",
        num_workers: int | None = None,
        cache: bool = False,
    ):
        self.images_dir = Path(images_dir)
        self.mask_dir = Path(mask_dir)
        assert 0 < scale <= 1, "Scale must be between 0 and 1"
        self.scale = scale
        self.mask_suffix = mask_suffix
        # Opt-in RAM cache of preprocessed samples (beyond-reference;
        # `--cache-dataset`). Motivation, measured at the reference's
        # training resolution (959×640): host PNG decode is ~300 ms/image
        # and the reference's 5×-per-epoch validation re-decodes the whole
        # val split every time, leaving the TPU >95% idle (1.55 img/s
        # end-to-end vs 71 img/s device capability, BENCH_NOTES.md r2).
        # Dict writes are GIL-atomic, so loader threads need no lock (a
        # racing pair just decodes one sample twice). Samples are returned
        # by reference — the train path never mutates batches.
        self._cache: dict[int, dict] | None = {} if cache else None

        self.ids = [
            splitext(file)[0]
            for file in listdir(images_dir)
            if isfile(join(images_dir, file)) and not file.startswith(".")
        ]
        if not self.ids:
            raise RuntimeError(
                f"No input file found in {images_dir}, make sure you put your images there"
            )

        logger.info("Creating dataset with %d examples", len(self.ids))
        logger.info("Scanning mask files to determine unique values")
        scan = partial(unique_mask_values, mask_dir=self.mask_dir, mask_suffix=self.mask_suffix)
        if num_workers == 0:
            unique = [scan(i) for i in self.ids]
        else:
            # Threads, not processes: the reference uses a fork-based Pool,
            # but fork after JAX initializes its runtime threads can deadlock
            # (observed RuntimeWarning in live runs). PIL decode releases the
            # GIL, so threads parallelize the scan equally well.
            with ThreadPoolExecutor(max_workers=num_workers) as p:
                unique = list(p.map(scan, self.ids))

        self.mask_values = list(
            sorted(np.unique(np.concatenate(unique), axis=0).tolist())
        )
        logger.info("Unique mask values: %s", self.mask_values)

    def __len__(self):
        return len(self.ids)

    @staticmethod
    def preprocess(mask_values, pil_img: Image.Image, scale: float, is_mask: bool):
        """The reference's shared train/predict transform, channels-last.

        Returns HWC float32 (image) or HW int64 class-index map (mask).
        """
        w, h = pil_img.size
        new_w, new_h = int(scale * w), int(scale * h)
        assert new_w > 0 and new_h > 0, "Scale is too small, resized images would have no pixel"
        resample = Image.NEAREST if is_mask else Image.BICUBIC
        # Native C++ resampler when available: bit-exact Pillow semantics
        # (self-check-gated in tpu_unet/native), GIL-free and row-threaded.
        # Returns None for modes/filters it doesn't serve → PIL fallback.
        img = native_preproc.pil_resize_native(pil_img, new_w, new_h, resample)
        if img is None:
            img = np.asarray(pil_img.resize((new_w, new_h), resample=resample))

        if is_mask:
            mask = np.zeros((new_h, new_w), dtype=np.int64)
            for i, v in enumerate(mask_values):
                if img.ndim == 2:
                    mask[img == v] = i
                else:
                    mask[(img == v).all(-1)] = i
            return mask
        else:
            if img.ndim == 2:
                img = img[..., None]
            img = img.astype(np.float32)
            if (img > 1).any():
                img = img / 255.0
            return img  # HWC (reference emits CHW; layout-only divergence)

    def __getitem__(self, idx):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        name = self.ids[idx]
        mask_file = list(self.mask_dir.glob(name + self.mask_suffix + ".*"))
        img_file = list(self.images_dir.glob(name + ".*"))

        assert len(img_file) == 1, f"Either no image or multiple images found for the ID {name}: {img_file}"
        assert len(mask_file) == 1, f"Either no mask or multiple masks found for the ID {name}: {mask_file}"
        mask = load_image(mask_file[0])
        img = load_image(img_file[0])
        assert img.size == mask.size, (
            f"Image and mask {name} should be the same size, but are {img.size} and {mask.size}"
        )

        img = self.preprocess(self.mask_values, img, self.scale, is_mask=False)
        mask = self.preprocess(self.mask_values, mask, self.scale, is_mask=True)
        sample = {"image": img, "mask": mask}
        if self._cache is not None:
            self._cache[idx] = sample
        return sample


class CarvanaDataset(BasicDataset):
    """Carvana car-mask dataset: masks live next to images with `_mask` suffix."""

    def __init__(self, images_dir, mask_dir, scale=1.0, num_workers=None, cache=False):
        super().__init__(images_dir, mask_dir, scale, mask_suffix="_mask",
                         num_workers=num_workers, cache=cache)


class RawDataset(BasicDataset):
    """Decode-only dataset for the device-side preprocessing pipeline.

    __getitem__ returns raw uint8 arrays (no resize/normalize on host) —
    data/device_pipeline.py does the rest on the TPU. Requires uniform raw
    image sizes (true for Carvana); asserts on the first mismatch.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        first = load_image(list(self.images_dir.glob(self.ids[0] + ".*"))[0])
        self.raw_w, self.raw_h = first.size

    def __getitem__(self, idx):
        name = self.ids[idx]
        mask_file = list(self.mask_dir.glob(name + self.mask_suffix + ".*"))
        img_file = list(self.images_dir.glob(name + ".*"))
        assert len(img_file) == 1 and len(mask_file) == 1, f"bad id {name}"
        img = load_image(img_file[0])
        mask = load_image(mask_file[0])
        assert img.size == (self.raw_w, self.raw_h), (
            f"RawDataset requires uniform image sizes; {name} is {img.size}, "
            f"expected {(self.raw_w, self.raw_h)}"
        )
        img_arr = native_preproc.asarray_fast(img)
        if img_arr.ndim == 2:
            img_arr = img_arr[..., None]
        return {"image": img_arr.astype(np.uint8),
                "mask": native_preproc.asarray_fast(mask)}


class RawCarvanaDataset(RawDataset):
    def __init__(self, images_dir, mask_dir, scale=1.0, num_workers=None):
        super().__init__(images_dir, mask_dir, scale, mask_suffix="_mask", num_workers=num_workers)


def random_split_indices(n: int, val_fraction: float, seed: int = 0):
    """Deterministic train/val split with torch.random_split parity.

    The reference splits with ``random_split(..., generator=manual_seed(0))``
    (SURVEY.md §3.1); torch draws a randperm(n) and takes [train, val] spans
    IN THAT ORDER (val span is the TAIL). We reproduce it bit-for-bit via
    torch when available so resumed runs see identical splits.
    """
    n_val = int(n * val_fraction)  # int() truncation, as the reference does
    n_train = n - n_val
    try:
        import torch

        perm = torch.randperm(n, generator=torch.Generator().manual_seed(seed)).tolist()
    except ImportError:  # torch-free deployment: documented fallback
        perm = np.random.default_rng(seed).permutation(n).tolist()
    return perm[:n_train], perm[n_train:]
