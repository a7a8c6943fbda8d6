"""Dice/loss parity vs a torch transcription of the reference semantics
(SURVEY.md §2 #11–#12, §4.2 edge cases)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpu_unet.losses import (
    bce_with_logits,
    cross_entropy,
    dice_coeff,
    dice_loss,
    iou_coeff,
    multiclass_dice_coeff,
)


def torch_dice_coeff(inp, tgt, reduce_batch_first=False, epsilon=1e-6):
    # Torch oracle written from the SURVEY spec (reference semantics).
    sum_dim = (-1, -2) if inp.dim() == 2 or not reduce_batch_first else (-1, -2, -3)
    inter = 2 * (inp * tgt).sum(dim=sum_dim)
    sets_sum = inp.sum(dim=sum_dim) + tgt.sum(dim=sum_dim)
    sets_sum = torch.where(sets_sum == 0, inter, sets_sum)
    return ((inter + epsilon) / (sets_sum + epsilon)).mean()


def test_dice_coeff_matches_torch(rng):
    x = rng.random((4, 16, 16), dtype=np.float32)
    y = (rng.random((4, 16, 16)) > 0.5).astype(np.float32)
    for rbf in (False, True):
        ours = dice_coeff(jnp.asarray(x), jnp.asarray(y), reduce_batch_first=rbf)
        ref = torch_dice_coeff(torch.from_numpy(x), torch.from_numpy(y), rbf)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_dice_empty_mask_guard():
    """Two empty masks → Dice 1 (the sets_sum==0 → inter guard)."""
    z = jnp.zeros((2, 8, 8))
    assert float(dice_coeff(z, z)) == 1.0
    assert float(dice_loss(z, z)) == 0.0
    assert float(iou_coeff(z, z)) == 1.0


def test_multiclass_dice_matches_torch(rng):
    # NHWC one-hots vs the reference's NCHW flatten(0,1).
    probs = rng.random((2, 8, 8, 3), dtype=np.float32)
    onehot = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 8, 8))]
    ours = multiclass_dice_coeff(
        jnp.asarray(probs), jnp.asarray(onehot), reduce_batch_first=True
    )
    t_in = torch.from_numpy(probs.transpose(0, 3, 1, 2)).flatten(0, 1)
    t_tg = torch.from_numpy(onehot.transpose(0, 3, 1, 2)).flatten(0, 1)
    ref = torch_dice_coeff(t_in, t_tg, reduce_batch_first=True)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 8), dtype=np.float32) * 5
    targets = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    ours = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 8, 5), dtype=np.float32)
    labels = rng.integers(0, 5, (2, 8, 8))
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)), torch.from_numpy(labels)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_dice_weight_scales_and_drops_the_dice_term(rng):
    """--dice-weight semantics (train.py::compute_loss): 0 is the legacy
    reference layout's plain BCE/CE (SURVEY.md §A.1), other values scale
    the Dice term linearly around the reference's 1.0."""
    from tpu_unet.train import compute_loss

    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 1), dtype=np.float32))
    masks = jnp.asarray((rng.random((2, 8, 8)) > 0.5).astype(np.int32))

    full = float(compute_loss(logits, masks, 1))
    plain = float(compute_loss(logits, masks, 1, dice_weight=0.0))
    half = float(compute_loss(logits, masks, 1, dice_weight=0.5))

    ref_bce = float(bce_with_logits(logits[..., 0], masks.astype(jnp.float32)))
    np.testing.assert_allclose(plain, ref_bce, rtol=1e-6)
    np.testing.assert_allclose(half, plain + 0.5 * (full - plain), rtol=1e-5)

    # Multiclass path takes the same knob.
    logits_mc = jnp.asarray(rng.standard_normal((2, 8, 8, 3), dtype=np.float32))
    masks_mc = jnp.asarray(rng.integers(0, 3, (2, 8, 8)))
    full_mc = float(compute_loss(logits_mc, masks_mc, 3))
    plain_mc = float(compute_loss(logits_mc, masks_mc, 3, dice_weight=0.0))
    assert plain_mc < full_mc  # the dice term is non-negative here
