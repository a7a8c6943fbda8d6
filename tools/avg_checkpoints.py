"""Average the weights of several checkpoints into one (SWA-style).

Usage:
    python tools/avg_checkpoints.py checkpoints/checkpoint_epoch{3,4,5}.npz \
        -o checkpoints/checkpoint_avg.npz

The output is a standard checkpoint — loadable by predict/serve/evaluate/
export — carrying the newest input's mask_values and config metadata plus
an ``averaged_from`` provenance list. See
tpu_unet.checkpoint.average_checkpoints for semantics (BN-stat caveat).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("inputs", nargs="+", help="Checkpoints to average "
                   "(order them oldest→newest; metadata comes from the last)")
    p.add_argument("--output", "-o", required=True, help="Output checkpoint path")
    args = p.parse_args(argv)

    from tpu_unet.checkpoint import average_checkpoints

    average_checkpoints(args.inputs, args.output)
    print(f"Averaged {len(args.inputs)} checkpoints -> {args.output}")


if __name__ == "__main__":
    main()
