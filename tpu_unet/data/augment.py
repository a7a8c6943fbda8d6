"""Device-side data augmentation (opt-in, beyond-reference).

The reference has NO augmentation (SURVEY.md §3.1 — its DataLoader feeds
raw preprocessed frames). For production training this module adds the
standard segmentation set as ONE jitted XLA program over the already
device-resident batch: per-sample horizontal/vertical flips (applied to
image AND mask in lockstep) and photometric jitter (brightness/contrast,
image only). Geometry is limited to flips/rot180 — they preserve the
static [N,H,W,*] shapes, cost a gather each, and keep mask semantics exact
(no interpolation through class indices).

All randomness comes from a threaded ``jax.random`` key: fold_in(step) at
the call site makes every batch's draw reproducible from the run seed,
independent of host iteration order.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    hflip: bool = True          # random horizontal flip, p=0.5 per sample
    vflip: bool = False         # random vertical flip, p=0.5 per sample
    rot180: bool = False        # random 180° rotation, p=0.5 per sample
    brightness: float = 0.0     # additive jitter amplitude in [0,1] units
    contrast: float = 0.0       # multiplicative jitter amplitude


@functools.partial(jax.jit, static_argnames=("config",))
def augment_batch(
    key: jax.Array,
    images: jax.Array,   # [N,H,W,C] float in [0,1]
    masks: jax.Array,    # [N,H,W] int class indices
    *,
    config: AugmentConfig = AugmentConfig(),
):
    """Apply the configured augmentations; returns (images, masks)."""
    n = images.shape[0]
    k_h, k_v, k_r, k_b, k_c = jax.random.split(key, 5)

    def flip(imgs, msks, do, axis):
        fi = jnp.flip(imgs, axis=axis)
        fm = jnp.flip(msks, axis=axis)
        sel = do.reshape((n,) + (1,) * (imgs.ndim - 1))
        return (
            jnp.where(sel, fi, imgs),
            jnp.where(do.reshape((n, 1, 1)), fm, msks),
        )

    if config.hflip:
        images, masks = flip(images, masks, jax.random.bernoulli(k_h, 0.5, (n,)), axis=2)
    if config.vflip:
        images, masks = flip(images, masks, jax.random.bernoulli(k_v, 0.5, (n,)), axis=1)
    if config.rot180:
        do = jax.random.bernoulli(k_r, 0.5, (n,))
        ri = jnp.flip(images, axis=(1, 2))
        rm = jnp.flip(masks, axis=(1, 2))
        sel = do.reshape((n,) + (1,) * (images.ndim - 1))
        images = jnp.where(sel, ri, images)
        masks = jnp.where(do.reshape((n, 1, 1)), rm, masks)

    if config.brightness > 0:
        delta = jax.random.uniform(
            k_b, (n, 1, 1, 1), minval=-config.brightness, maxval=config.brightness
        )
        images = images + delta
    if config.contrast > 0:
        factor = 1.0 + jax.random.uniform(
            k_c, (n, 1, 1, 1), minval=-config.contrast, maxval=config.contrast
        )
        mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
        images = (images - mean) * factor + mean
    if config.brightness > 0 or config.contrast > 0:
        images = jnp.clip(images, 0.0, 1.0)

    return images, masks
