"""Aggregate per-family convergence demos into ARCH_DEMOS.json.

VERDICT r3 next #2: every shipped ``--arch`` needs on-chip Dice evidence,
not just throughput and shape tests. tools/train_demo.py --preset arch
--arch <fam> writes demo_runs/arch_<fam>.json; this tool collects them into
the repo-root ARCH_DEMOS.json the docs cite, and suggests calibrated
per-family floors (measured Dice minus a noise margin) for
train_demo.ARCH_FLOORS.

Usage: python tools/collect_arch_demos.py [--runs demo_runs] [--margin 0.02]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

FIELDS = (
    "final_val_dice", "final_val_iou", "heldout_dice", "heldout_iou",
    "heldout_dice_tta", "heldout_dice_tta_hflip", "first_loss", "last_loss",
    "steps", "lr", "epochs", "heldout_n", "train_wall_s", "device",
    "dice_floor", "heldout_floor", "passed",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=Path, default=Path("demo_runs"))
    ap.add_argument("--out", type=Path, default=Path("ARCH_DEMOS.json"))
    ap.add_argument("--margin", type=float, default=0.02,
                    help="Floor suggestion = measured Dice - margin "
                         "(headroom for run-to-run noise)")
    args = ap.parse_args()

    demos = {}
    for path in sorted(args.runs.glob("arch_*.json")):
        rec = json.loads(path.read_text())
        if rec.get("preset") != "arch":
            continue
        demos[rec["arch"]] = {k: rec[k] for k in FIELDS if k in rec}
    if not demos:
        raise SystemExit(f"no arch_*.json demos under {args.runs}")
    args.out.write_text(json.dumps(demos, indent=2) + "\n")
    print(f"wrote {args.out} ({len(demos)} families)")
    for arch, rec in demos.items():
        v = rec["final_val_dice"] - args.margin
        h = rec["heldout_dice"] - args.margin
        print(f"  {arch:10s} val {rec['final_val_dice']:.4f} "
              f"heldout {rec['heldout_dice']:.4f}  "
              f"-> suggested floors ({v:.3f}, {h:.3f})")


if __name__ == "__main__":
    main()
