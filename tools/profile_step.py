"""On-chip profile of the headline train step → per-op time breakdown.

Runs the bench-config train step (572², b16, bf16) under jax.profiler,
then parses the xplane trace DEVICE plane (/device:TPU:0, "XLA Ops" line)
and prints the top ops by self-time plus a category rollup
(conv / fusion / reduce / copy / other). This is the measured ground truth
for MFU work — BENCH_NOTES.md round-1/2 experiments were ablation-based
because we had not yet verified the profiler works through the axon relay
(it does; events carry real duration_ps).

Usage (real chip, ~10 min first compile):
  python tools/profile_step.py [--batch 16] [--steps 2] [--size 572]
Parse an existing trace only:
  python tools/profile_step.py --parse /tmp/trace_step
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def run_trace(trace_dir: str, batch: int, steps: int, size: int,
              vmem_limit_kib: int | None = None) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tpu_unet.models import UNetConfig, init_unet
    from tpu_unet.optim import rmsprop_init
    from tpu_unet.train import make_train_step

    config = UNetConfig(3, 1, bilinear=False)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    step = make_train_step(config, amp=True, vmem_limit_kib=vmem_limit_kib)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (batch, size, size)))
    lr = jnp.float32(1e-5)

    print("compiling...", flush=True)
    params, state, opt, loss, _ = step(params, state, opt, images, masks, lr)
    print("warm, loss:", float(loss), flush=True)

    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        params, state, opt, loss, _ = step(params, state, opt, images, masks, lr)
    print("traced loss:", float(loss), flush=True)  # D2H sync inside the trace
    jax.profiler.stop_trace()
    print("trace written to", trace_dir, flush=True)


CATEGORIES = (
    ("conv", re.compile(r"%?(convolution|conv)", re.I)),
    ("matmul", re.compile(r"%?(dot|einsum)", re.I)),
    ("reduce", re.compile(r"%?(reduce|all-reduce)", re.I)),
    ("copy/transpose", re.compile(r"%?(copy|transpose|bitcast|reshape)", re.I)),
    ("fusion", re.compile(r"%?fusion", re.I)),
)


def categorize(name: str) -> str:
    for cat, pat in CATEGORIES:
        if pat.match(name):
            return cat
    return "other"


def parse_trace(trace_dir: str, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())

    per_op: dict[str, float] = collections.defaultdict(float)
    module_ms = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ms += sum(e.duration_ps for e in line.events) / 1e9
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                name = plane.event_metadata[e.metadata_id].name
                short = name.split(" = ")[0].lstrip("%")
                per_op[short] += e.duration_ps / 1e9  # ps → ms

    total = sum(per_op.values())
    print(f"\n== XLA Modules wall: {module_ms:.2f} ms | sum of op self-times: {total:.2f} ms ==")
    cats: dict[str, float] = collections.defaultdict(float)
    for op, ms in per_op.items():
        cats[categorize(op)] += ms
    print("\n-- category rollup --")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{ms:10.2f} ms  {ms / total * 100:5.1f}%  {cat}")
    print(f"\n-- top {top} ops --")
    for op, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:10.2f} ms  {ms / total * 100:5.1f}%  {op}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/trace_step")
    ap.add_argument("--vmem-limit-mb", type=int, default=64,
                    help="Scoped-VMEM budget, matching the tuned headline (0 = default budget)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--size", type=int, default=572)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--parse", default=None, help="Parse this trace dir only (no run)")
    args = ap.parse_args()
    if args.parse:
        parse_trace(args.parse, args.top)
        return
    import jax

    # The scoped-VMEM option is TPU-only (the CPU backend rejects it);
    # gate like bench.py/train.py so the tool still runs anywhere.
    on_tpu = jax.default_backend() != "cpu"
    run_trace(args.trace_dir, args.batch, args.steps, args.size,
              vmem_limit_kib=args.vmem_limit_mb * 1024
              if (args.vmem_limit_mb and on_tpu) else None)
    parse_trace(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
