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
    # Elastic deformation — THE original U-Net augmentation (Ronneberger et
    # al. §3.1: "random elastic deformations ... the key concept to train
    # with very few annotated images"). alpha = displacement magnitude in
    # pixels; grid = coarse control-grid spacing in pixels (the smoothness
    # scale: larger grid = smoother warps). 0 disables.
    elastic_alpha: float = 0.0
    elastic_grid: int = 64
    # Random affine jitter (the paper's "shift and rotation invariance"),
    # composed with the elastic field into the SAME single gather pass:
    # rotation ~ U(±rot_deg) degrees about the center, isotropic scale
    # ~ U(1±scale_jitter), translation ~ U(±shift_px) pixels per axis.
    rot_deg: float = 0.0
    scale_jitter: float = 0.0
    shift_px: float = 0.0


def _warp(key, images, masks, config: "AugmentConfig"):
    """Per-sample smooth random warp, shape-preserving and fully gathered.

    One pass covers the paper's whole geometric menu: an inverse-affine
    term (rotation/scale/shift about the image center) plus the elastic
    field. TPU-native formulation: instead of the paper's dense-noise +
    Gaussian blur, sample a COARSE control grid of displacements and
    bilinearly upsample it to full resolution (same smooth field, no
    convolution), then warp with one 4-corner gather per pixel. Images
    sample bilinearly; masks sample nearest (class indices must never be
    interpolated).
    """
    n, h, w, _ = images.shape
    k_field, k_rot, k_scale, k_shift = jax.random.split(key, 4)

    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # [1,h,1]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # [1,1,w]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    # Inverse affine: source = c + R(-θ)·(dst − c − t)/s, per sample.
    theta = jnp.deg2rad(jax.random.uniform(
        k_rot, (n, 1, 1), minval=-config.rot_deg, maxval=config.rot_deg))
    scale = 1.0 + jax.random.uniform(
        k_scale, (n, 1, 1), minval=-config.scale_jitter,
        maxval=config.scale_jitter)
    shift = jax.random.uniform(
        k_shift, (n, 2, 1, 1), minval=-config.shift_px,
        maxval=config.shift_px)
    dy = (yy - cy - shift[:, 0]) / scale
    dx = (xx - cx - shift[:, 1]) / scale
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    sy = cy + cos * dy - sin * dx  # R(−θ): [cos −sin; sin cos]·(dy,dx)ᵀ… y-x order
    sx = cx + sin * dy + cos * dx

    if config.elastic_alpha > 0:
        grid = config.elastic_grid
        gh = max(2, h // grid + 1)
        gw = max(2, w // grid + 1)
        field = jax.random.uniform(k_field, (n, gh, gw, 2),
                                   minval=-1.0, maxval=1.0)
        field = jax.image.resize(field, (n, h, w, 2),
                                 method="bilinear") * config.elastic_alpha
        sy = sy + field[..., 0]
        sx = sx + field[..., 1]

    sy = jnp.clip(sy, 0.0, h - 1.0)  # [n,h,w] source coords
    sx = jnp.clip(sx, 0.0, w - 1.0)
    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    wy = (sy - y0f)[..., None]
    wx = (sx - x0f)[..., None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def warp_img(img, y0, y1, x0, x1, wy, wx):
        top = (1 - wx) * img[y0, x0] + wx * img[y0, x1]
        bot = (1 - wx) * img[y1, x0] + wx * img[y1, x1]
        return (1 - wy) * top + wy * bot

    images = jax.vmap(warp_img)(images, y0, y1, x0, x1, wy, wx)
    yn = jnp.round(sy).astype(jnp.int32)
    xn = jnp.round(sx).astype(jnp.int32)
    masks = jax.vmap(lambda m, ys, xs: m[ys, xs])(masks, yn, xn)
    return images, masks


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
    k_h, k_v, k_r, k_b, k_c, k_e = jax.random.split(key, 6)

    if (config.elastic_alpha > 0 or config.rot_deg > 0
            or config.scale_jitter > 0 or config.shift_px > 0):
        images, masks = _warp(k_e, images, masks, config)

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
