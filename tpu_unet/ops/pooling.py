"""Pooling ops, NHWC. Parity: torch.nn.MaxPool2d(2) (reference:
unet/unet_parts.py — Down, UNVERIFIED mount, SURVEY.md §2 #2).

``lax.reduce_window`` with VALID padding reproduces torch's floor-mode output
size for odd inputs and lowers to a single VPU pass on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """Max pooling. x: [N,H,W,C] -> [N,H//w,W//w,C] (floor mode, like torch).

    Implementation note (measured on the chip): standalone,
    ``lax.reduce_window`` bf16 is ~10× slower than a Pallas pool, but inside
    the full train graph a reshape-split+max variant REGRESSED end-to-end
    throughput 65→59 img/s (XLA fuses reduce_window with its producers
    better than the relayouting reshapes) — so reduce_window stays. The
    Pallas pool (kernels/pooling.py) serves the inference path.
    """
    if stride is None:
        stride = window
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


# Train-path pool backward: XLA's select-and-scatter stays, deliberately.
# The step profile (tools/profile_step.py, b16 572² bf16) shows it at
# ~8 ms/step (~3.6%) across the four levels, and BOTH replacements measured
# worse (BENCH_NOTES.md round 2):
#   * Pallas first-max routing kernel: VMEM-infeasible — Mosaic relayouts of
#     the in-kernel W-pair reshapes need 34 MB scoped VMEM at 286²·C64
#     against the 16 MB stack limit.
#   * Pure-XLA strided-view + cumulative first-max masks + stack-interleave
#     (custom_vjp): bit-exact, but 71.0 → 61.8 img/s end-to-end — stride-2
#     W access and interleave relayouts on the (8,128)-tiled layout cost
#     more than the windowed scatter they replace (same failure mode as the
#     reshape-split FORWARD experiment, see max_pool2d's note).
