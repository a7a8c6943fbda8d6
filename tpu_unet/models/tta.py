"""Test-time augmentation: dihedral-flip ensembling in ONE batched forward.

Beyond-reference capability (the reference predicts each image once;
SURVEY.md §2 #17). Segmentation masks are equivariant under the flip
subgroup {identity, hflip, vflip, rot180}, so averaging predictions over
those four views is the classic cheap accuracy lever (the full D4 group
needs square images; flips work for any H×W).

TPU-native formulation: the four views are CONCATENATED on the batch axis
and run as one forward — a b·4 program keeps the MXU at its batched
efficiency instead of paying four small dispatches, and one compile covers
all views. The inverse flips are applied to the per-view logits, which are
then averaged. Averaging LOGITS (= geometric mean of the odds) rather than
probabilities keeps the downstream contract untouched: the reference's
parity-critical order (upscale logits to the original size, THEN
threshold/argmax — SURVEY.md §3.2) applies to the merged logits exactly as
it does to single-view logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_unet.models.unet import UNetConfig, unet_apply

# (flip_h, flip_w) for each view; identity first. "flips" is the full flip
# subgroup; "hflip" is identity + left-right only — the classic choice for
# scenes with a gravity axis (cars on the ground, shadows below: vertical
# flips are out-of-distribution there, measured in BENCH_NOTES r3).
TTA_MODES = {
    "flips": ((False, False), (False, True), (True, False), (True, True)),
    "hflip": ((False, False), (False, True)),
}
TTA_FLIPS = TTA_MODES["flips"]


def flip(x, flip_h: bool, flip_w: bool):
    """Flip a [N,H,W,C] batch on H and/or W (its own inverse)."""
    if flip_h:
        x = x[:, ::-1]
    if flip_w:
        x = x[:, :, ::-1]
    return x


def tta_views(x, mode: str = "flips"):
    """[N,H,W,C] → [kN,H,W,C]: the mode's flip views, batch-concatenated."""
    return jnp.concatenate(
        [flip(x, fh, fw) for fh, fw in TTA_MODES[mode]], axis=0)


def tta_merge(view_logits, n: int, mode: str = "flips"):
    """Invert each view's flip and average: [kN,H,W,C] logits → [N,H,W,C].

    The flips are involutions, so inverse = the same flip.
    """
    flips = TTA_MODES[mode]
    parts = [
        flip(view_logits[i * n:(i + 1) * n], fh, fw)
        for i, (fh, fw) in enumerate(flips)
    ]
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return total / len(parts)


def tta_logits(params, state, x, *, config: UNetConfig, compute_dtype=None,
               mode: str = "flips", batched: bool = True):
    """Flip-ensembled logits for a batch, as one traced program.

    batched=True concatenates the views on the batch axis and runs ONE k·N
    forward — the right shape at predict/serve batch 1, where the 4-view
    batch is what keeps the MXU busy. But it also multiplies activation
    memory by k: at evaluation batch sizes on the heavier families it blows
    HBM (measured: UNet++ 320×480 bc64 at eval batch 8 → the k=4 view batch
    needs 19.6 GB against the chip's 15.75 GB). batched=False instead
    ``lax.scan``s the forward over the k stacked views — one live forward at
    a time by construction, peak memory ≈ a single-view forward plus the
    [k,N,H,W,n_classes] logits stack (tiny next to the activations). Both
    paths accumulate the un-flipped per-view logits in the same order, so
    their numerics match (tests/test_tta.py).
    """
    if batched:
        logits, _ = unet_apply(
            params, state, tta_views(x, mode), config=config, train=False,
            compute_dtype=compute_dtype,
        )
        return tta_merge(logits, x.shape[0], mode)
    flips = TTA_MODES[mode]
    views = jnp.stack([flip(x, fh, fw) for fh, fw in flips])  # [k,N,H,W,C]

    def body(_, v):
        logits, _st = unet_apply(params, state, v, config=config, train=False,
                                 compute_dtype=compute_dtype)
        return None, logits

    _, stacked = jax.lax.scan(body, None, views)  # [k,N,H,W,n_classes]
    parts = [flip(stacked[i], fh, fw) for i, (fh, fw) in enumerate(flips)]
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return total / len(parts)
