"""Skip-connection spatial alignment.

Parity: the reference's Up.forward pads the upsampled tensor x1 to the skip
tensor x2's spatial size with floor/ceil split —
``F.pad(x1, [diffX//2, diffX - diffX//2, diffY//2, diffY - diffY//2])``
(reference: unet/unet_parts.py — Up.forward, UNVERIFIED, SURVEY.md §2 #3).
This makes the net tolerant of odd input sizes (959×640 → /16 rounds).
Static shapes at trace time, so jit specializes per input size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_to_match(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Zero-pad NHWC x1 spatially so its H,W match x2's (torch floor/ceil split)."""
    diff_y = x2.shape[-3] - x1.shape[-3]
    diff_x = x2.shape[-2] - x1.shape[-2]
    if diff_y == 0 and diff_x == 0:
        return x1
    return jnp.pad(
        x1,
        (
            (0, 0),
            (diff_y // 2, diff_y - diff_y // 2),
            (diff_x // 2, diff_x - diff_x // 2),
            (0, 0),
        ),
    )
