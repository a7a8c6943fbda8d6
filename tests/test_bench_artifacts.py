"""The driver-scored artifacts must not rot: bench.py's measurement path and
its JSON contract, exercised at toy scale on CPU."""

import json
import subprocess
import sys

import bench
from tpu_unet.models import UNetConfig


def test_bench_batch_runs_at_toy_scale():
    # Pass the toy shape EXPLICITLY: bench_batch's h/w/config defaults bind
    # bench.H/W/CONFIG at def time, so monkeypatching the module attributes
    # (as this test originally did) silently ran the REAL 572² 31M train
    # step on CPU — 829 s of the "fast" tier (measured r5).
    ips = bench.bench_batch(
        2, iters=2, amp=True, h=32, w=32,
        config=UNetConfig(3, 1, bilinear=True, base_channels=8))
    assert ips > 0


def test_baseline_measured_json_exists():
    import pathlib

    d = json.loads((pathlib.Path(bench.__file__).parent / "BASELINE_MEASURED.json").read_text())
    assert d["torch_cpu_images_per_sec_572_train"] > 0
