"""UNet++ model family: structure, forward, train step, CLI cycle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet, param_count, unet_apply


CONFIG = UNetConfig(3, 2, base_channels=8, arch="unetpp")


def test_unetpp_forward_shapes():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 48, 32, 3), dtype=np.float32))
    logits, new_state = unet_apply(params, state, x, config=CONFIG, train=True)
    assert logits.shape == (2, 48, 32, 2)
    assert logits.dtype == jnp.float32
    # 15 double-conv nodes in a depth-5 grid.
    assert sum(1 for k in new_state if k.startswith("x")) == 15


def test_unetpp_more_params_than_unet():
    pp, _ = init_unet(jax.random.PRNGKey(0), CONFIG)
    un, _ = init_unet(jax.random.PRNGKey(0), UNetConfig(3, 2, bilinear=True, base_channels=8))
    assert param_count(pp) > param_count(un)


def test_unetpp_odd_sizes():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 59, 41, 3), dtype=np.float32))
    logits, _ = unet_apply(params, state, x, config=CONFIG, train=False)
    assert logits.shape == (1, 59, 41, 2)


def test_unetpp_train_step_decreases_loss():
    from tpu_unet.data import synth_batch
    from tpu_unet.optim import rmsprop_init
    from tpu_unet.train import make_train_step

    config = UNetConfig(3, 1, base_channels=8, arch="unetpp")
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    step = make_train_step(config)
    imgs, masks = synth_batch(np.random.default_rng(0), 4, 32, 32)
    imgs, masks = jnp.asarray(imgs), jnp.asarray(masks)
    losses = []
    for _ in range(6):
        params, state, opt, loss, _ = step(params, state, opt, imgs, masks, jnp.float32(1e-3))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_unetpp_deep_supervision():
    config = UNetConfig(3, 2, base_channels=8, arch="unetpp", deep_supervision=True)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    assert "head4" in params and "outc" not in params
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 32, 32, 3), dtype=np.float32))
    logits, _ = unet_apply(params, state, x, config=config, train=True)
    assert logits.shape == (1, 32, 32, 2)
    # Gradients must reach the earliest column's head (all columns supervised).
    def loss(p):
        lg, _ = unet_apply(p, state, x, config=config, train=True)
        return jnp.mean(lg ** 2)
    g = jax.grad(loss)(params)
    assert float(jnp.max(jnp.abs(g["head1"]["w"]))) > 0


def test_unetpp_remat_and_bf16():
    params, state = init_unet(jax.random.PRNGKey(0), CONFIG)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 32, 32, 3), dtype=np.float32))
    a, _ = unet_apply(params, state, x, config=CONFIG, train=False)
    b, _ = unet_apply(params, state, x, config=CONFIG, train=False, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    c, _ = unet_apply(params, state, x, config=CONFIG, train=False, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=0.2, rtol=0.1)
