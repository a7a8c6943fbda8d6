"""Synthetic Carvana-like data generation.

No network in any environment this runs in (SURVEY.md §A.2) — the Kaggle
download of the reference's scripts/download_data.sh (SURVEY.md §2 #21) is
replaced by a deterministic generator producing car-ish blobs on structured
backgrounds, used by tests, benchmarks, and smoke training runs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def synth_sample(rng: np.random.Generator, h: int, w: int):
    """One (image, binary mask) pair: an ellipse 'car' on a gradient scene."""
    yy, xx = np.mgrid[0:h, 0:w]
    cy = rng.uniform(0.35 * h, 0.65 * h)
    cx = rng.uniform(0.35 * w, 0.65 * w)
    ry = rng.uniform(0.15 * h, 0.3 * h)
    rx = rng.uniform(0.2 * w, 0.4 * w)
    theta = rng.uniform(-0.3, 0.3)
    ys, xs = (yy - cy), (xx - cx)
    yr = ys * np.cos(theta) - xs * np.sin(theta)
    xr = ys * np.sin(theta) + xs * np.cos(theta)
    mask = ((yr / ry) ** 2 + (xr / rx) ** 2 <= 1.0).astype(np.uint8)

    bg = (
        0.4 * np.sin(2 * np.pi * xx / w * rng.uniform(1, 3))
        + 0.4 * np.cos(2 * np.pi * yy / h * rng.uniform(1, 3))
    )
    img = np.stack(
        [
            0.5 + 0.3 * bg + 0.1 * rng.standard_normal((h, w)),
            0.5 - 0.2 * bg + 0.1 * rng.standard_normal((h, w)),
            0.5 + 0.1 * bg + 0.1 * rng.standard_normal((h, w)),
        ],
        axis=-1,
    )
    color = rng.uniform(0.1, 0.9, size=3)
    img = np.where(mask[..., None] > 0, color + 0.05 * np.random.default_rng(0).standard_normal((h, w, 3)), img)
    img = np.clip(img, 0, 1)
    return (img * 255).astype(np.uint8), mask * 255


def make_synthetic_carvana(
    root: str | Path, n: int = 8, h: int = 64, w: int = 96, seed: int = 0
) -> tuple[Path, Path]:
    """Write a Carvana-layout dataset (imgs/, masks/ with _mask suffix)."""
    root = Path(root)
    img_dir, mask_dir = root / "imgs", root / "masks"
    img_dir.mkdir(parents=True, exist_ok=True)
    mask_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img, mask = synth_sample(rng, h, w)
        Image.fromarray(img).save(img_dir / f"car_{i:04d}.png")
        Image.fromarray(mask).save(mask_dir / f"car_{i:04d}_mask.png")
    return img_dir, mask_dir


def make_synthetic_voc(
    root: str | Path, n: int = 8, h: int = 64, w: int = 96,
    n_classes: int = 21, seed: int = 0,
) -> tuple[Path, Path]:
    """Multi-class (VOC-style) synthetic dataset: up to 3 class blobs per
    image on a background of class 0; mask pixel value = class index
    (north-star config #3)."""
    root = Path(root)
    img_dir, mask_dir = root / "imgs", root / "masks"
    img_dir.mkdir(parents=True, exist_ok=True)
    mask_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img = np.clip(
            0.5 + 0.2 * rng.standard_normal((h, w, 3)), 0, 1
        )
        mask = np.zeros((h, w), np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        for _ in range(rng.integers(1, 4)):
            cls = int(rng.integers(1, n_classes))
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            ry, rx = rng.uniform(h / 8, h / 3), rng.uniform(w / 8, w / 3)
            blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            mask[blob] = cls
            img[blob] = rng.uniform(0.1, 0.9, 3)
        Image.fromarray((img * 255).astype(np.uint8)).save(img_dir / f"im_{i:04d}.png")
        Image.fromarray(mask).save(mask_dir / f"im_{i:04d}_mask.png")
    return img_dir, mask_dir


def synth_batch(rng: np.random.Generator, n: int, h: int, w: int):
    """In-memory NHWC float batch + NHW int mask batch (no files)."""
    imgs, masks = [], []
    for _ in range(n):
        img, mask = synth_sample(rng, h, w)
        imgs.append(img.astype(np.float32) / 255.0)
        masks.append((mask > 0).astype(np.int64))
    return np.stack(imgs), np.stack(masks)
