"""Device-side augmentation: geometry stays image/mask-consistent, photometric
jitter is bounded and mask-free, and draws are key-deterministic."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.data.augment import AugmentConfig, augment_batch


def _batch(rng, n=8, h=16, w=24):
    imgs = jnp.asarray(rng.random((n, h, w, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (n, h, w)))
    return imgs, masks


def test_hflip_applies_to_image_and_mask_in_lockstep(rng):
    imgs, masks = _batch(rng)
    cfg = AugmentConfig(hflip=True)
    out_i, out_m = augment_batch(jax.random.PRNGKey(0), imgs, masks, config=cfg)
    flipped = 0
    for k in range(imgs.shape[0]):
        same = np.allclose(out_i[k], imgs[k])
        if same:
            assert np.array_equal(out_m[k], masks[k])
        else:
            np.testing.assert_allclose(out_i[k], imgs[k, :, ::-1])
            assert np.array_equal(out_m[k], masks[k, :, ::-1])
            flipped += 1
    assert 0 < flipped < imgs.shape[0]  # p=0.5 over 8 samples


def test_photometric_bounded_and_masks_untouched(rng):
    imgs, masks = _batch(rng)
    cfg = AugmentConfig(hflip=False, brightness=0.1, contrast=0.1)
    out_i, out_m = augment_batch(jax.random.PRNGKey(1), imgs, masks, config=cfg)
    assert np.array_equal(out_m, masks)
    assert float(out_i.min()) >= 0.0 and float(out_i.max()) <= 1.0
    # brightness/contrast at 0.1 cannot move a pixel by more than ~0.2
    assert float(jnp.abs(out_i - imgs).max()) < 0.25
    assert not np.allclose(out_i, imgs)


def test_same_key_same_draw(rng):
    imgs, masks = _batch(rng)
    cfg = AugmentConfig(hflip=True, vflip=True, rot180=True, brightness=0.2, contrast=0.2)
    a = augment_batch(jax.random.PRNGKey(7), imgs, masks, config=cfg)
    b = augment_batch(jax.random.PRNGKey(7), imgs, masks, config=cfg)
    c = augment_batch(jax.random.PRNGKey(8), imgs, masks, config=cfg)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_train_model_augment_smoke(tmp_path, rng):
    """--augment end-to-end: one epoch on synthetic data trains and checkpoints."""
    from tpu_unet.data import make_synthetic_carvana
    from tpu_unet.data.loading import CarvanaDataset
    from tpu_unet.models import UNetConfig, init_unet
    from tpu_unet.train import _build_augment, train_model

    make_synthetic_carvana(tmp_path / "d", n=4, h=48, w=64)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks", 1.0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    params, state, history = train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=2,
        learning_rate=1e-3, val_percent=0.25, save_checkpoint_flag=False,
        checkpoint_dir=tmp_path / "ck", augment=_build_augment(True, 0.0),
    )
    assert np.isfinite(history["train_loss"]).all()


def test_elastic_deformation():
    """Elastic warp: shapes preserved, masks stay exact class indices (no
    interpolation), images stay within the input's value range (bilinear
    convexity), a constant image is a fixed point, alpha=0 is identity, and
    draws are deterministic per key."""
    import jax
    import jax.numpy as jnp

    from tpu_unet.data.augment import AugmentConfig, augment_batch

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 40, 56, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (2, 40, 56)))
    cfg = AugmentConfig(hflip=False, elastic_alpha=8.0, elastic_grid=16)
    key = jax.random.PRNGKey(7)

    ai, am = augment_batch(key, images, masks, config=cfg)
    assert ai.shape == images.shape and am.shape == masks.shape
    assert set(np.unique(np.asarray(am))) <= set(np.unique(np.asarray(masks)))
    assert float(ai.min()) >= float(images.min()) - 1e-6
    assert float(ai.max()) <= float(images.max()) + 1e-6
    # The warp actually moved something.
    assert not np.allclose(np.asarray(ai), np.asarray(images))

    # Determinism per key.
    ai2, am2 = augment_batch(key, images, masks, config=cfg)
    np.testing.assert_array_equal(np.asarray(ai), np.asarray(ai2))
    np.testing.assert_array_equal(np.asarray(am), np.asarray(am2))

    # Constant image is a fixed point of any warp.
    const = jnp.full_like(images, 0.25)
    ci, _ = augment_batch(key, const, masks, config=cfg)
    np.testing.assert_allclose(np.asarray(ci), 0.25, atol=1e-6)

    # alpha=0 is identity.
    zi, zm = augment_batch(key, images, masks,
                           config=AugmentConfig(hflip=False, elastic_alpha=0.0))
    np.testing.assert_array_equal(np.asarray(zi), np.asarray(images))
    np.testing.assert_array_equal(np.asarray(zm), np.asarray(masks))


def test_affine_warp_properties():
    """Rotation/scale/shift jitter: shapes/range/mask-exactness hold, a
    constant image is a fixed point, and zero jitter is the identity."""
    import jax
    import jax.numpy as jnp

    from tpu_unet.data.augment import AugmentConfig, augment_batch

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((2, 36, 48, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (2, 36, 48)))
    cfg = AugmentConfig(hflip=False, rot_deg=15.0, scale_jitter=0.1,
                        shift_px=4.0)
    key = jax.random.PRNGKey(11)

    ai, am = augment_batch(key, images, masks, config=cfg)
    assert ai.shape == images.shape and am.shape == masks.shape
    assert set(np.unique(np.asarray(am))) <= set(np.unique(np.asarray(masks)))
    assert float(ai.min()) >= float(images.min()) - 1e-6
    assert float(ai.max()) <= float(images.max()) + 1e-6
    assert not np.allclose(np.asarray(ai), np.asarray(images))

    const = jnp.full_like(images, 0.5)
    ci, _ = augment_batch(key, const, masks, config=cfg)
    np.testing.assert_allclose(np.asarray(ci), 0.5, atol=1e-6)

    zi, zm = augment_batch(key, images, masks,
                           config=AugmentConfig(hflip=False))
    np.testing.assert_array_equal(np.asarray(zi), np.asarray(images))
    np.testing.assert_array_equal(np.asarray(zm), np.asarray(masks))
