"""R2U-Net model family (arXiv:1802.06955): structure, recurrence, training,
CLI + self-describing checkpoint surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet, param_count, unet_apply

CONFIG = UNetConfig(3, 2, bilinear=True, base_channels=8, arch="r2u")


def test_r2u_forward_shapes_both_decoders():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 48, 32, 3), dtype=np.float32))
    for bilinear in (True, False):
        config = CONFIG._replace(bilinear=bilinear)
        params, state = init_unet(jax.random.PRNGKey(0), config)
        logits, new_state = unet_apply(params, state, x, config=config,
                                       train=True)
        assert logits.shape == (2, 48, 32, 2)
        assert logits.dtype == jnp.float32
        # Every block is an RRCNN: two shared recurrent units, one BN each.
        for k in ("inc", "down1", "down4"):
            assert set(new_state[k]) == {"rec1", "rec2"}


def test_recur_bn_layouts_agree_in_train_mode():
    """config.recur_bn selects the BN-statistics layout: "per_step"
    (default; one running mean/var per weight-shared application —
    arXiv:1603.09025) vs "shared" (the torch formulation, one BN stepped
    t+1 times). Train-mode normalization uses batch statistics, so the two
    layouts must produce IDENTICAL logits from the same weights; only the
    running-statistics bookkeeping differs."""
    shared_cfg = CONFIG._replace(recur_bn="shared")
    params, state_ps = init_unet(jax.random.PRNGKey(0), CONFIG)
    params_s, state_sh = init_unet(jax.random.PRNGKey(0), shared_cfg)
    # Same weights either way (the layout lives in the STATE tree only).
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(params)[0]),
        np.asarray(jax.tree.leaves(params_s)[0]))
    assert set(state_ps["inc"]["rec1"]) == {"bn0", "bn1", "bn2"}
    assert set(state_sh["inc"]["rec1"]) == {"bn"}
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 32, 32, 3),
                                                 dtype=np.float32))
    y_ps, ns_ps = unet_apply(params, state_ps, x, config=CONFIG, train=True)
    y_sh, _ = unet_apply(params, state_sh, x, config=shared_cfg, train=True)
    np.testing.assert_allclose(np.asarray(y_ps), np.asarray(y_sh),
                               atol=1e-5, rtol=1e-5)
    # Per-step stats really are per application: the t+1 trees saw
    # different activation distributions, so their running means differ.
    r1 = ns_ps["inc"]["rec1"]
    assert float(jnp.abs(r1["bn0"].mean - r1["bn1"].mean).max()) > 1e-6


def test_r2u_odd_sizes():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 59, 41, 3),
                                                 dtype=np.float32))
    logits, _ = unet_apply(params, state, x, config=CONFIG, train=False)
    assert logits.shape == (1, 59, 41, 2)


def test_r2u_recurrence_depth_matters_weights_shared():
    """recur_t changes the function (t=1 vs t=2 logits differ) WITHOUT
    changing the parameter tree — the recurrent unit's weights are shared
    across applications, which is the point of the architecture."""
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    p1, _ = init_unet(jax.random.PRNGKey(0), CONFIG._replace(recur_t=1))
    assert param_count(params) == param_count(p1)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 32, 32, 3),
                                                 dtype=np.float32))
    y2, _ = unet_apply(params, state, x, config=CONFIG, train=True)
    y1, _ = unet_apply(params, state, x, config=CONFIG._replace(recur_t=1),
                       train=True)
    assert float(jnp.abs(y2 - y1).max()) > 1e-6
    # Poking the ONE shared conv changes the output (there is no second
    # per-application weight to mask the edit).
    poked = jax.tree.map(lambda p: p, params)
    poked["inc"]["rec1"]["conv"]["w"] = poked["inc"]["rec1"]["conv"]["w"] + 0.1
    yp, _ = unet_apply(poked, state, x, config=CONFIG, train=True)
    assert float(jnp.abs(yp - y2).max()) > 1e-6


def test_r2u_train_step_and_remat():
    from tpu_unet.optim import rmsprop_init
    from tpu_unet.train import make_train_step

    config = UNetConfig(3, 1, bilinear=True, base_channels=8, arch="r2u")
    params, state = init_unet(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray((rng.random((2, 32, 32)) > 0.5).astype(np.int32))
    copy = lambda t: jax.tree.map(jnp.array, t)

    losses = {}
    for remat in (False, True):
        step = make_train_step(config, remat=remat)
        _, _, _, loss, _ = step(copy(params), copy(state),
                                rmsprop_init(params), imgs, masks,
                                jnp.float32(1e-3))
        losses[remat] = float(loss)
    assert np.isfinite(losses[False]) and losses[False] > 0
    # remat recomputes, it must not change the math.
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_r2u_cli_train_predict_roundtrip(tmp_path, caplog):
    """--arch r2u end-to-end: train CLI writes a self-describing checkpoint
    (arch + recur_t in extra['config']); predict rebuilds the exact model
    from it with no arch flags. The run's lr (1e-3) sits in the measured
    RMSprop divergence zone for recurrent families (BENCH_NOTES r4), so the
    recipe warning must fire."""
    import logging
    import sys

    from tpu_unet.data import make_synthetic_carvana
    from tpu_unet.predict import main as predict_main
    from tpu_unet.train import main as train_main

    make_synthetic_carvana(tmp_path / "d", n=6, h=32, w=32)
    argv = sys.argv
    try:
        sys.argv = ["train", "-e", "1", "-b", "2", "-l", "1e-3", "-s", "1.0",
                    "--arch", "r2u", "--recur-t", "3",
                    "--data-dir", str(tmp_path / "d"),
                    "--checkpoint-dir", str(tmp_path / "ck")]
        with caplog.at_level(logging.WARNING, logger="tpu_unet.train"):
            train_main()
        assert any("diverged in" in r.getMessage() for r in caplog.records)
        from tpu_unet.checkpoint import read_checkpoint_meta

        _, extra = read_checkpoint_meta(tmp_path / "ck" / "checkpoint_epoch1.npz")
        assert extra["config"]["arch"] == "r2u"
        assert extra["config"]["recur_t"] == 3
        out = tmp_path / "out.png"
        sys.argv = ["predict", "-m", str(tmp_path / "ck" / "checkpoint_epoch1.npz"),
                    "-i", str(tmp_path / "d" / "imgs" / "car_0000.png"),
                    "-o", str(out), "-s", "1.0"]
        predict_main()
        assert out.exists()
    finally:
        sys.argv = argv


def test_r2u_tiler_receptive_field_guard():
    """R2U's RRCNN blocks apply 2·(t+1) 3x3 convs per level, so its
    receptive field outgrows the default 128 halo — the tiler must refuse
    (tiled_forward) or bump-and-warn (predict wrappers) instead of
    silently mis-stitching."""
    import pytest

    from tpu_unet.parallel.tiling import DEFAULT_HALO, min_halo, tiled_forward

    flagship = UNetConfig(3, 1, bilinear=True, base_channels=8)
    assert min_halo(flagship) == DEFAULT_HALO
    r2u = flagship._replace(arch="r2u")
    need = min_halo(r2u)
    assert need > DEFAULT_HALO and need % 16 == 0
    assert min_halo(r2u._replace(recur_t=3)) > need  # grows with t

    params, state = init_unet(jax.random.PRNGKey(0), r2u)
    x = jnp.zeros((1, 512, 512, 3), jnp.float32)
    with pytest.raises(ValueError, match="exactness requirement"):
        tiled_forward(params, state, x, config=r2u, tile=128,
                      halo=DEFAULT_HALO)


@pytest.mark.slow
def test_per_step_bn_fixes_adam_eval_collapse(tmp_path):
    """The r5 root-cause regression (BENCH_NOTES r5): under a fast
    optimizer the SHARED-stats recurrence collapses in eval mode (running
    stats are an EMA over t+1 different per-application distributions —
    measured toy: train-mode Dice 0.89 vs eval-mode 0.06), while the
    per-step default stays consistent. Train both layouts from identical
    weights on identical data; the per-step eval Dice must be sane and
    far above the shared form's."""
    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
    from tpu_unet.evaluate import evaluate
    from tpu_unet.data import DataLoader, random_split_indices
    from tpu_unet.train import train_model

    # The r5 diagnostic's exact sizing — the collapse is scale-sensitive
    # (at 48×64/bc8 both layouts landed ~0.73; at this config the shared
    # form measured 0.057 vs per-step 0.924).
    make_synthetic_carvana(tmp_path / "d", n=24, h=64, w=96)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, cache=True)
    results = {}
    for layout in ("per_step", "shared"):
        config = UNetConfig(3, 1, bilinear=True, base_channels=16,
                            arch="r2attu", recur_bn=layout)
        params, state = init_unet(jax.random.PRNGKey(0), config)
        params, state, _ = train_model(
            params, state, config, dataset=ds, epochs=12, batch_size=4,
            learning_rate=1e-3, optimizer="adam", val_percent=1 / 6,
            save_checkpoint_flag=False, seed=0)
        _, val_idx = random_split_indices(len(ds), 1 / 6, seed=0)
        dice, _ = evaluate(params, state, DataLoader(ds, 4, indices=val_idx),
                           config, amp=False)
        results[layout] = float(dice)
    # Identical weights trajectory (train-mode semantics are layout-equal);
    # only the eval-mode normalization differs.
    assert results["per_step"] > 0.6, results
    assert results["per_step"] > results["shared"] + 0.1, results
