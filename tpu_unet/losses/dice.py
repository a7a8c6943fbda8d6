"""Dice coefficient / loss with exact reference semantics.

Parity target (reference: utils/dice_score.py — dice_coeff,
multiclass_dice_coeff, dice_loss; UNVERIFIED mount, SURVEY.md §2 #11–#12):

  * inter = 2·Σ(x·y); sets_sum = Σx + Σy, replaced by inter where it is 0
    (the empty-mask guard → Dice 1 for two empty masks);
  * dice = (inter + ε) / (sets_sum + ε), ε = 1e-6, mean over batch/channels;
  * multiclass flattens (N, C) and reuses the same kernel;
  * dice_loss = 1 − dice with reduce_batch_first=True.

Shapes are channels-last JAX-native: binary masks [N,H,W] (or [H,W]),
multiclass one-hots [N,H,W,C]. Pure jnp reductions → XLA fuses the three
spatial sums into one VPU pass; no host sync inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_coeff(
    input: jax.Array,
    target: jax.Array,
    reduce_batch_first: bool = False,
    epsilon: float = 1e-6,
    axis_name: str | None = None,
) -> jax.Array:
    """Average of Dice coefficient for all batches, or for a single mask.

    input/target: [H,W] or [N,H,W] (binary masks / probabilities).

    ``axis_name`` (shard_map data parallelism) reproduces the GLOBAL-batch
    value: with reduce_batch_first the Dice ratio is one global
    Σinter/Σsets over the whole batch, which does NOT decompose into a mean
    of per-shard ratios — the sums must be psum'd across devices before
    the division (the GSPMD jit path gets this implicitly).
    """
    assert input.shape == target.shape
    assert input.ndim == 3 or not reduce_batch_first
    sum_dim = (-1, -2) if input.ndim == 2 or not reduce_batch_first else (-1, -2, -3)

    inter = 2 * jnp.sum(input * target, axis=sum_dim)
    sets_sum = jnp.sum(input, axis=sum_dim) + jnp.sum(target, axis=sum_dim)
    if axis_name is not None and reduce_batch_first:
        inter = jax.lax.psum(inter, axis_name)
        sets_sum = jax.lax.psum(sets_sum, axis_name)
    sets_sum = jnp.where(sets_sum == 0, inter, sets_sum)

    dice = (inter + epsilon) / (sets_sum + epsilon)
    dice = jnp.mean(dice)
    if axis_name is not None and not reduce_batch_first:
        # Per-sample ratios: global mean = mean of equal-size shard means.
        dice = jax.lax.pmean(dice, axis_name)
    return dice


def multiclass_dice_coeff(
    input: jax.Array,
    target: jax.Array,
    reduce_batch_first: bool = False,
    epsilon: float = 1e-6,
    axis_name: str | None = None,
) -> jax.Array:
    """Average of Dice coefficient for all classes.

    input/target: [N,H,W,C] one-hot (channels-last; the reference's NCHW
    flatten(0,1) is reproduced by folding N and C together).
    """
    n, h, w, c = input.shape
    flat_in = jnp.moveaxis(input, -1, 1).reshape(n * c, h, w)
    flat_tg = jnp.moveaxis(target, -1, 1).reshape(n * c, h, w)
    return dice_coeff(flat_in, flat_tg, reduce_batch_first, epsilon, axis_name)


def dice_loss(
    input: jax.Array,
    target: jax.Array,
    multiclass: bool = False,
    axis_name: str | None = None,
) -> jax.Array:
    """Dice loss (objective to minimize) between 0 and 1."""
    fn = multiclass_dice_coeff if multiclass else dice_coeff
    return 1 - fn(input, target, reduce_batch_first=True, axis_name=axis_name)


def iou_coeff(
    input: jax.Array,
    target: jax.Array,
    epsilon: float = 1e-6,
) -> jax.Array:
    """Mean IoU over batch (binary [N,H,W] or one-hot [N,H,W,C]).

    Not in the reference (SURVEY.md §5 metrics note) but scored by the north
    star; same empty-mask convention as Dice (IoU 1 when both empty).
    """
    if input.ndim == 4:
        n, h, w, c = input.shape
        input = jnp.moveaxis(input, -1, 1).reshape(n * c, h, w)
        target = jnp.moveaxis(target, -1, 1).reshape(n * c, h, w)
    inter = jnp.sum(input * target, axis=(-1, -2))
    union = jnp.sum(input, axis=(-1, -2)) + jnp.sum(target, axis=(-1, -2)) - inter
    union = jnp.where(union == 0, inter, union)
    return jnp.mean((inter + epsilon) / (union + epsilon))
