"""Test-time augmentation (models/tta.py): the batched 4-view forward is
exactly the mean of the four single-view forwards, and the CLI surfaces
(`predict --tta`, `evaluate --tta`) drive it end to end."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from tpu_unet.evaluate import eval_step
from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.models.tta import TTA_FLIPS, tta_logits, tta_merge, tta_views


def _manual_tta(params, state, x, config):
    """Reference formulation: four separate forwards, unflip, average."""
    outs = []
    for fh, fw in TTA_FLIPS:
        v = x[:, ::-1] if fh else x
        v = v[:, :, ::-1] if fw else v
        logits, _ = unet_apply(params, state, v, config=config, train=False)
        logits = logits[:, ::-1] if fh else logits
        logits = logits[:, :, ::-1] if fw else logits
        outs.append(np.asarray(logits))
    return np.mean(np.stack(outs), axis=0)


@pytest.fixture(scope="module")
def small_model():
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    return params, state, config


def test_views_and_merge_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 6, 10, 3), dtype=np.float32))
    views = tta_views(x)
    assert views.shape == (8, 6, 10, 3)
    # Merging the views of x themselves inverts every flip → mean == x.
    np.testing.assert_allclose(np.asarray(tta_merge(views, 2)),
                               np.asarray(x), rtol=0, atol=1e-7)


def test_tta_logits_match_manual_ensemble(small_model, rng):
    params, state, config = small_model
    # Odd spatial size: exercises the floor/ceil skip padding under flips.
    x = jnp.asarray(rng.random((2, 34, 46, 3), dtype=np.float32))
    got = np.asarray(tta_logits(params, state, x, config=config))
    want = _manual_tta(params, state, x, config)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_eval_step_tta(small_model, rng):
    params, state, config = small_model
    images = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (2, 32, 32)))
    d, i = eval_step(params, state, images, masks, config=config, tta=True)
    # Dice/IoU from the manually ensembled logits must agree.
    from tpu_unet.losses import dice_coeff, iou_coeff

    logits = _manual_tta(params, state, images, config)
    pred = (jax.nn.sigmoid(jnp.asarray(logits[..., 0])) > 0.5).astype(jnp.float32)
    tgt = masks.astype(jnp.float32)
    np.testing.assert_allclose(
        float(d), float(dice_coeff(pred, tgt, reduce_batch_first=False)), atol=1e-6)
    np.testing.assert_allclose(float(i), float(iou_coeff(pred, tgt)), atol=1e-6)


def test_predict_img_tta_and_cli(small_model, tmp_path):
    params, state, config = small_model
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.predict import main as predict_main, predict_img

    rng = np.random.default_rng(1)
    arr = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    img = Image.fromarray(arr)

    mask = predict_img(params, state, config, img, scale_factor=1.0, tta=True)
    assert mask.shape == (40, 56) and mask.dtype == bool

    ckpt = tmp_path / "model.npz"
    save_checkpoint(ckpt, params, state, mask_values=[0, 1],
                    extra={"config": config._asdict()})
    img_path = tmp_path / "in.png"
    img.save(img_path)
    out_path = tmp_path / "out.png"
    predict_main(["-m", str(ckpt), "-i", str(img_path), "-o", str(out_path),
                  "-s", "1.0", "--tta"])
    cli_mask = np.asarray(Image.open(out_path))
    np.testing.assert_array_equal(cli_mask.astype(bool), mask)

    # --tta composes with every forward except the folded-kernel path.
    with pytest.raises(SystemExit):
        predict_main(["-m", str(ckpt), "-i", str(img_path), "--tta",
                      "--kernels", "xla", "-n"])


@pytest.mark.parametrize("arch", ["unetpp", "attention"])
def test_tta_covers_all_model_families(arch, rng):
    """tta_logits rides unet_apply's arch dispatch, so UNet++ and Attention
    U-Net ensemble identically to the manual four-forward formulation."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8, arch=arch)
    params, state = init_unet(jax.random.PRNGKey(3), config)
    x = jnp.asarray(rng.random((1, 32, 48, 3), dtype=np.float32))
    got = np.asarray(tta_logits(params, state, x, config=config))
    want = _manual_tta(params, state, x, config)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


@pytest.mark.parametrize("arch,mode", [("unet", "flips"), ("unet", "hflip"),
                                       ("unetpp", "flips")])
def test_tta_scanned_matches_batched(arch, mode, rng):
    """batched=False (the lax.scan memory-lean form evaluate() uses — one
    live forward instead of a k·N view batch) ensembles to the same logits
    as the batched form, across modes and the arch dispatch."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8, arch=arch)
    params, state = init_unet(jax.random.PRNGKey(5), config)
    x = jnp.asarray(rng.random((2, 34, 46, 3), dtype=np.float32))
    batched = np.asarray(tta_logits(params, state, x, config=config, mode=mode))
    scanned = np.asarray(tta_logits(params, state, x, config=config, mode=mode,
                                    batched=False))
    np.testing.assert_allclose(scanned, batched, rtol=0, atol=1e-5)


def test_tta_hflip_mode(small_model, rng):
    """hflip mode = identity + left-right only: equals the manual 2-view
    ensemble, and the CLI accepts --tta-mode hflip end to end."""
    from tpu_unet.models.tta import TTA_MODES

    params, state, config = small_model
    x = jnp.asarray(rng.random((1, 32, 40, 3), dtype=np.float32))
    got = np.asarray(tta_logits(params, state, x, config=config, mode="hflip"))
    outs = []
    for fh, fw in TTA_MODES["hflip"]:
        v = x[:, :, ::-1] if fw else x
        logits, _ = unet_apply(params, state, v, config=config, train=False)
        outs.append(np.asarray(logits[:, :, ::-1] if fw else logits))
    np.testing.assert_allclose(got, np.mean(np.stack(outs), axis=0),
                               rtol=0, atol=1e-5)
