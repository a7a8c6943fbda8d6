"""Attention U-Net model family: structure, gating, train step, interop."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet, param_count, unet_apply

CONFIG = UNetConfig(3, 2, bilinear=True, base_channels=8, arch="attention")


def test_attention_forward_shapes_both_decoders():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 48, 32, 3), dtype=np.float32))
    for bilinear in (True, False):
        config = CONFIG._replace(bilinear=bilinear)
        params, state = init_unet(jax.random.PRNGKey(0), config)
        logits, new_state = unet_apply(params, state, x, config=config,
                                       train=True)
        assert logits.shape == (2, 48, 32, 2)
        assert logits.dtype == jnp.float32
        # One gate per decoder level, each with three BN states.
        for i in range(1, 5):
            assert set(new_state[f"up{i}"]["att"]) == {"bn_g", "bn_x",
                                                       "bn_psi"}


def test_attention_params_superset_of_unet():
    """Same channel plan as the classic U-Net plus ~3% gate params."""
    att, _ = init_unet(jax.random.PRNGKey(0), CONFIG)
    un, _ = init_unet(
        jax.random.PRNGKey(0), UNetConfig(3, 2, bilinear=True,
                                          base_channels=8))
    extra = param_count(att) - param_count(un)
    assert 0 < extra < 0.1 * param_count(un)
    assert set(un) < set(att) or all(k in att for k in un)


def test_attention_odd_sizes():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 59, 41, 3),
                                                 dtype=np.float32))
    logits, _ = unet_apply(params, state, x, config=CONFIG, train=False)
    assert logits.shape == (1, 59, 41, 2)


def test_attention_gate_actually_gates():
    """Poking a gate's psi projection must change the logits (train mode:
    batch-norm keeps activations O(1), so the gate's effect is visible —
    in eval mode with FRESH running stats the untrained net's deep
    activations vanish and any gate change is ~1e-8)."""
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 32, 3),
                                                 dtype=np.float32))
    base, _ = unet_apply(params, state, x, config=CONFIG, train=True)
    poked = jax.tree_util.tree_map(lambda p: p, params)
    poked["up1"]["att"]["psi"]["w"] = (
        params["up1"]["att"]["psi"]["w"] + 5.0)
    changed, _ = unet_apply(poked, state, x, config=CONFIG, train=True)
    assert np.abs(np.asarray(base) - np.asarray(changed)).max() > 1e-4
    # Gradients reach every gate projection (the gate is trained).
    def loss(p):
        lg, _ = unet_apply(p, state, x, config=CONFIG, train=True)
        return jnp.mean(lg ** 2)
    g = jax.grad(loss)(params)
    for i in range(1, 5):
        for proj in ("wg", "wx", "psi"):
            assert float(jnp.max(jnp.abs(g[f"up{i}"]["att"][proj]["w"]))) > 0


def test_attention_train_step_decreases_loss():
    from tpu_unet.data import synth_batch
    from tpu_unet.optim import rmsprop_init
    from tpu_unet.train import make_train_step

    config = UNetConfig(3, 1, bilinear=True, base_channels=8,
                        arch="attention")
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    step = make_train_step(config)
    imgs, masks = synth_batch(np.random.default_rng(0), 4, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)
    losses = []
    for _ in range(6):
        params, state, opt, loss, _ = step(params, state, opt, imgs, masks,
                                           jnp.float32(1e-3))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_attention_remat_and_bf16():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 32, 32, 3),
                                                 dtype=np.float32))
    a, _ = unet_apply(params, state, x, config=CONFIG, train=False)
    b, _ = unet_apply(params, state, x, config=CONFIG, train=False,
                      remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    c, _ = unet_apply(params, state, x, config=CONFIG, train=False,
                      compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=0.2,
                               rtol=0.1)


def test_attention_pallas_kernels_refused():
    import pytest

    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="attention"):
        unet_apply(params, state, x, config=CONFIG, train=True,
                   kernels="pallas")


def test_attention_checkpoint_roundtrip(tmp_path):
    """Self-describing checkpoint restores arch='attention' end to end."""
    from tpu_unet.checkpoint import load_checkpoint, save_checkpoint

    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    path = tmp_path / "att.npz"
    save_checkpoint(path, params, state, mask_values=[0, 255],
                    extra={"config": CONFIG._asdict()})
    p2, s2 = init_unet(jax.random.PRNGKey(1), CONFIG)
    p2, s2, mv, extra = load_checkpoint(path, p2, s2)
    assert extra["config"]["arch"] == "attention"
    assert mv == [0, 255]
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 32, 32, 3),
                                                 dtype=np.float32))
    a, _ = unet_apply(params, state, x, config=CONFIG, train=False)
    b, _ = unet_apply(p2, s2, x, config=CONFIG, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_folded_inference_matches_train_false():
    """fold_bn folds the gate projections too: unet_infer_apply(xla) ≡
    unet_apply(train=False) for arch='attention' (both decoders)."""
    from tpu_unet.models.infer import fold_bn, unet_infer_apply

    for bilinear in (True, False):
        config = CONFIG._replace(bilinear=bilinear)
        params, state = init_unet(jax.random.PRNGKey(0), config)
        # Perturb BN state so folding is non-trivial.
        state = jax.tree.map(
            lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype) / a.size,
            state)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 48, 32, 3),
                                                     dtype=np.float32))
        ref, _ = unet_apply(params, state, x, config=config, train=False)
        folded = fold_bn(params, state, config)
        out = unet_infer_apply(folded, x, config=config, backend="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)


def test_fold_bn_refuses_unetpp_and_pallas_attention():
    import pytest

    from tpu_unet.models.infer import fold_bn, unet_infer_apply

    cfgpp = UNetConfig(3, 2, bilinear=True, base_channels=8, arch="unetpp")
    ppp, spp = init_unet(jax.random.PRNGKey(0), cfgpp)
    with pytest.raises(ValueError, match="unetpp"):
        fold_bn(ppp, spp, cfgpp)
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    folded = fold_bn(params, state, CONFIG)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="flagship"):
        unet_infer_apply(folded, x, config=CONFIG, backend="pallas")


def test_attention_export_roundtrip(tmp_path):
    """AOT .jaxexp export serves the attention family too (the gate math
    is baked into the folded StableHLO)."""
    from tpu_unet.export import export_infer

    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    state = jax.tree.map(
        lambda a: a + 0.03 * jnp.arange(a.size, dtype=a.dtype) / a.size,
        state)
    exported = export_infer(params, state, CONFIG, height=32, width=32,
                            amp=False)
    x = np.random.default_rng(7).standard_normal((2, 32, 32, 3),
                                                 dtype=np.float32)
    got = np.asarray(exported.call(jnp.asarray(x)))
    ref, _ = unet_apply(params, state, jnp.asarray(x), config=CONFIG,
                        train=False)
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_attention_halo_sharded_matches_full():
    """The halo-exchange spatially-sharded forward is arch-generic: the
    attention gates are 1x1 projections, so the receptive-field/halo
    contract is the flagship's — sharded ≡ full-image to fp32 tolerance."""
    from jax.sharding import Mesh

    from tpu_unet.parallel.tiling import make_halo_sharded_forward

    config = CONFIG._replace(n_classes=1, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    state = jax.tree.map(
        lambda a: a + 0.02 * jnp.arange(a.size, dtype=a.dtype) / a.size,
        state)
    devices = jax.devices()[:4]
    mesh = Mesh(devices, ("spatial",))
    # halo 128 > the depth-5 U-Net's one-sided receptive field (110 px,
    # measured in test_tiling.py); the gates don't widen it.
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((1, 4 * 256, 64, 3),
                                                  dtype=np.float32))
    full, _ = unet_apply(params, state, x, config=config, train=False)
    fwd = make_halo_sharded_forward(mesh, config, halo=128)
    sharded = fwd(params, state, x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               atol=5e-4, rtol=1e-4)
