"""Probe the b16@959×640 relay compile ceiling (VERDICT r4 next #6).

BENCH_NOTES r4 recorded: the straight-b16 fused train step at the
production shape (Carvana --scale 0.5 ⇒ 959×640, 31M flagship, bf16)
dies in the remote tpu_compile_helper with HTTP 500 — a program-size
limit of the relay tunnel, not chip OOM — and ships as accum-2×8 at
−18%. Nobody located the boundary. This probe bisects the batch axis
(b10/b12/b14/b16) and tries the non-donated b16 variant, recording for
each: compiled-or-500, and img/s if it compiled (D2H-synced, the only
honest sync on this relay).

Run ON THE CHIP (bare CLI): PYTHONPATH=/root/repo:/root/.axon_site
    python tools/probe_959_b16.py [--steps 10] [--reps 3]
Writes demo_runs/probe_959_b16.json.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.optim import rmsprop_init
from tpu_unet.train import make_train_step

H, W = 640, 959
CONFIG = UNetConfig(n_channels=3, n_classes=2, bilinear=False)


def _data(b):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((b, H, W, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (b, H, W)))
    return imgs, masks


def probe(b: int, *, steps: int, reps: int) -> dict:
    """One batch size: compile (or record the failure), then measure."""
    rec: dict = {"batch": b}
    step = make_train_step(CONFIG, amp=True, vmem_limit_kib=65536)
    imgs, masks = _data(b)
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    opt = rmsprop_init(params)
    t0 = time.time()
    try:
        params, state, opt, loss, _ = step(params, state, opt, imgs, masks,
                                           jnp.float32(1e-5))
        _ = float(loss)  # D2H fetch — the only real sync on the axon relay
    except Exception as e:  # noqa: BLE001 — record the relay failure verbatim
        rec.update(compiled=False, error=f"{type(e).__name__}: {str(e)[:500]}",
                   compile_wall_s=round(time.time() - t0, 1))
        return rec
    rec.update(compiled=True, compile_wall_s=round(time.time() - t0, 1))
    walls = []
    for _ in range(reps):
        t = time.time()
        for _ in range(steps):
            params, state, opt, loss, _ = step(params, state, opt, imgs,
                                               masks, jnp.float32(1e-5))
        _ = float(loss)
        walls.append(time.time() - t)
    rec["img_per_s"] = [round(b * steps / w, 2) for w in walls]
    rec["loss"] = float(loss)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 12, 10, 14])
    ap.add_argument("--out", default="demo_runs/probe_959_b16.json")
    args = ap.parse_args()
    results = []
    for b in args.batches:
        rec = probe(b, steps=args.steps, reps=args.reps)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    out = {"shape": [H, W], "device": str(jax.devices()[0]), "runs": results}
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
