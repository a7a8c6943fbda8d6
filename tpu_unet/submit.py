"""Carvana RLE submission writer.

Contingency component from SURVEY.md §A.1: the legacy (pre-2020) reference
layout ships ``submit.py`` writing a Kaggle Carvana run-length-encoded
submission CSV over all test images. The mount was empty so the fork's
vintage is unknown — this covers the legacy surface either way.

RLE per the Carvana challenge: column-major (Fortran) flattening, 1-indexed
start positions, "start length" pairs.
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)


def rle_encode(mask: np.ndarray) -> str:
    """Binary HW mask → Carvana RLE string (column-major, 1-indexed)."""
    pixels = np.asarray(mask, dtype=np.uint8).flatten(order="F")
    padded = np.concatenate([[0], pixels, [0]])
    changes = np.where(padded[1:] != padded[:-1])[0] + 1
    starts, ends = changes[::2], changes[1::2]
    return " ".join(f"{s} {e - s}" for s, e in zip(starts, ends))


def rle_decode(rle: str, shape: tuple[int, int]) -> np.ndarray:
    """Inverse of rle_encode (for round-trip tests)."""
    out = np.zeros(shape[0] * shape[1], dtype=np.uint8)
    tokens = list(map(int, rle.split()))
    for s, l in zip(tokens[::2], tokens[1::2]):
        out[s - 1 : s - 1 + l] = 1
    return out.reshape(shape, order="F")


def submit(model_path, in_dir, out_csv, scale=0.5, threshold=0.5, bilinear=False,
           tta=False, batch_size=8, tta_mode="flips"):
    """Predict every image in ``in_dir`` and write an RLE submission CSV.

    ``tta`` flip-ensembles each prediction (models/tta.py) — the classic
    leaderboard lever for a Carvana submission.

    Production scale: the Carvana test set is ~100k images, so per-image
    b1 dispatches (~100 ms each through a relay) would take hours. Images
    are BATCHED by (original, preprocessed) shape — on Carvana every image
    shares one shape, so the whole run is one compiled b=batch_size forward
    — and trailing partial groups are zero-padded to the batch size so no
    second program ever compiles. Each batched row is bit-identical to the
    single-image predict_img path (same forward, same upscale→threshold
    order; asserted in tests).
    """
    import jax
    import jax.numpy as jnp

    from tpu_unet.checkpoint import import_pth, load_checkpoint
    from tpu_unet.data.loading import BasicDataset
    from tpu_unet.predict import _forward_full
    from tpu_unet.models import UNetConfig, init_unet

    config = UNetConfig(3, 1, bilinear=bilinear)
    if str(model_path).endswith(".pth"):
        params, state, _ = import_pth(model_path, config)
    else:
        from tpu_unet.checkpoint import read_checkpoint_meta

        _, extra = read_checkpoint_meta(model_path)
        if "config" in extra:
            # Self-describing checkpoint: its stored config wins (same
            # contract as predict.py/evaluate.py).
            config = UNetConfig(**extra["config"])
        params, state = init_unet(jax.random.PRNGKey(0), config)
        params, state, _, _ = load_checkpoint(model_path, params, state)
    if config.n_classes != 1:
        raise ValueError("Carvana RLE submissions are binary; checkpoint has "
                         f"{config.n_classes} classes")

    files = sorted(
        f for f in os.listdir(in_dir) if not f.startswith(".")
    )
    rows: dict[str, str] = {}
    groups: dict[tuple, list] = {}  # (full_w, full_h) -> [(name, pre_img)]

    def flush(size, items):
        full_w, full_h = size
        n = len(items)
        x = np.stack([im for _, im in items])
        if n < batch_size:  # pad: one program per shape group, ever
            x = np.concatenate(
                [x, np.zeros((batch_size - n,) + x.shape[1:], x.dtype)])
        logits = _forward_full(
            params, state, jnp.asarray(x), config=config,
            full_h=full_h, full_w=full_w, tta=tta, tta_mode=tta_mode,
        )
        masks = np.asarray(jax.nn.sigmoid(logits[..., 0]) > threshold)
        for (name, _), mask in zip(items, masks):
            rows[name] = rle_encode(mask)
            logger.info("encoded %s", name)

    for name in files:
        img = Image.open(Path(in_dir) / name)
        pre = BasicDataset.preprocess(None, img, scale, is_mask=False)
        key = img.size
        groups.setdefault(key, []).append((name, pre))
        if len(groups[key]) == batch_size:
            flush(key, groups.pop(key))
    for key, items in groups.items():
        flush(key, items)

    with open(out_csv, "w") as f:
        f.write("img,rle_mask\n")
        for name in files:
            f.write(f"{name},{rows[name]}\n")
    logger.info("Wrote %d rows to %s", len(files), out_csv)


def main(argv=None):
    p = argparse.ArgumentParser(description="Write a Carvana RLE submission CSV")
    p.add_argument("--model", "-m", required=True)
    p.add_argument("--input-dir", "-i", required=True)
    p.add_argument("--output", "-o", default="SUBMISSION.csv")
    p.add_argument("--scale", "-s", type=float, default=0.5)
    p.add_argument("--mask-threshold", "-t", type=float, default=0.5)
    p.add_argument("--bilinear", action="store_true")
    p.add_argument("--tta", action="store_true", default=False,
                   help="Flip-ensemble test-time augmentation")
    p.add_argument("--tta-mode", choices=["flips", "hflip"], default="flips",
                   help="TTA view set: all four flips (default — matches "
                        "predict --tta bit-for-bit), or identity+left-right "
                        "only (recommended for Carvana-like studio shots: "
                        "the gravity axis makes vertical flips out-of-"
                        "distribution, BENCH_NOTES r3)")
    p.add_argument("--batch-size", "-b", type=int, default=8,
                   help="Images per batched forward (grouped by "
                        "shape; partial groups zero-padded so one "
                        "program compiles per shape)")
    a = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    submit(a.model, a.input_dir, a.output, a.scale, a.mask_threshold, a.bilinear,
           tta=a.tta, batch_size=a.batch_size, tta_mode=a.tta_mode)


if __name__ == "__main__":
    main()
