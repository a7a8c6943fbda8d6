"""R2AttU-Net model family (arXiv:1802.06955 §3 + the 1804.03999 gate):
structure, recurrence, gating, training, CLI + checkpoint surface."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet, param_count, unet_apply

CONFIG = UNetConfig(3, 2, bilinear=True, base_channels=8, arch="r2attu")


def test_r2attu_forward_shapes_both_decoders():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 48, 32, 3), dtype=np.float32))
    for bilinear in (True, False):
        config = CONFIG._replace(bilinear=bilinear)
        params, state = init_unet(jax.random.PRNGKey(0), config)
        logits, new_state = unet_apply(params, state, x, config=config,
                                       train=True)
        assert logits.shape == (2, 48, 32, 2)
        assert logits.dtype == jnp.float32
        # Encoder blocks are RRCNNs; every decoder block carries a gate.
        for k in ("inc", "down1", "down4"):
            assert set(new_state[k]) == {"rec1", "rec2"}
        for k in ("up1", "up4"):
            assert set(new_state[k]) == {"att", "conv"}


def test_r2attu_is_more_than_r2u():
    """Same channel plan as R2U plus the four gates — the combination is a
    distinct function AND a distinct (larger) parameter tree."""
    p_r2u, _ = init_unet(jax.random.PRNGKey(0), CONFIG._replace(arch="r2u"))
    p_att, _ = init_unet(jax.random.PRNGKey(0), CONFIG)
    assert param_count(p_att) > param_count(p_r2u)


def test_r2attu_gate_actually_gates():
    """Forcing every gate's psi projection strongly negative attenuates the
    skip path: the output must move. Guards against a wiring bug where the
    gate output is computed but the raw skip is concatenated anyway."""
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 32, 32, 3),
                                                 dtype=np.float32))
    y, _ = unet_apply(params, state, x, config=CONFIG, train=False)
    poked = jax.tree.map(jnp.array, params)
    for i in range(1, 5):
        gate = poked[f"up{i}"]["att"]
        gate["bn_psi"]["bias"] = gate["bn_psi"]["bias"] - 20.0
    yp, _ = unet_apply(poked, state, x, config=CONFIG, train=False)
    assert float(jnp.abs(yp - y).max()) > 1e-6


def test_r2attu_recurrence_depth_matters_weights_shared():
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


def test_r2attu_train_step_and_remat():
    from tpu_unet.optim import rmsprop_init
    from tpu_unet.train import make_train_step

    config = UNetConfig(3, 1, bilinear=True, base_channels=8, arch="r2attu")
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
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_r2attu_cli_train_predict_roundtrip(tmp_path):
    """--arch r2attu end-to-end: self-describing checkpoint (arch + recur_t
    in extra['config']); predict rebuilds the exact model with no flags."""
    import sys

    from tpu_unet.data import make_synthetic_carvana
    from tpu_unet.predict import main as predict_main
    from tpu_unet.train import main as train_main

    make_synthetic_carvana(tmp_path / "d", n=6, h=32, w=32)
    argv = sys.argv
    try:
        sys.argv = ["train", "-e", "1", "-b", "2", "-l", "1e-3", "-s", "1.0",
                    "--arch", "r2attu", "--recur-t", "1",
                    "--data-dir", str(tmp_path / "d"),
                    "--checkpoint-dir", str(tmp_path / "ck")]
        train_main()
        from tpu_unet.checkpoint import read_checkpoint_meta

        _, extra = read_checkpoint_meta(tmp_path / "ck" / "checkpoint_epoch1.npz")
        assert extra["config"]["arch"] == "r2attu"
        assert extra["config"]["recur_t"] == 1
        out = tmp_path / "out.png"
        sys.argv = ["predict", "-m", str(tmp_path / "ck" / "checkpoint_epoch1.npz"),
                    "-i", str(tmp_path / "d" / "imgs" / "car_0000.png"),
                    "-o", str(out), "-s", "1.0"]
        predict_main()
        assert out.exists()
    finally:
        sys.argv = argv


def test_r2attu_tiler_receptive_field_guard():
    """The gates are 1x1 convs: r2attu's receptive field equals r2u's at
    the same recur_t, and the tiler must refuse the default halo."""
    import pytest

    from tpu_unet.parallel.tiling import DEFAULT_HALO, min_halo, tiled_forward

    r2attu = UNetConfig(3, 1, bilinear=True, base_channels=8, arch="r2attu")
    need = min_halo(r2attu)
    assert need == min_halo(r2attu._replace(arch="r2u"))
    assert need > DEFAULT_HALO and need % 16 == 0

    params, state = init_unet(jax.random.PRNGKey(0), r2attu)
    x = jnp.zeros((1, 512, 512, 3), jnp.float32)
    with pytest.raises(ValueError, match="exactness requirement"):
        tiled_forward(params, state, x, config=r2attu, tile=128,
                      halo=DEFAULT_HALO)
