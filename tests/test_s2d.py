"""Space-to-depth reformulation (ops/s2d.py, VERDICT r2 next #4): the s2d
form of the full-res DoubleConv levels must be numerics-equivalent to the
plain form — forward, BN running stats, and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.ops.s2d import conv2d_s2d, depth_to_space, space_to_depth


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_conv2d_s2d_matches_conv2d(rng):
    from tpu_unet.ops import conv2d

    x = jnp.asarray(rng.standard_normal((2, 16, 24, 7), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 7, 13), dtype=np.float32))
    want = conv2d(x, w, stride=1, padding=1)
    got = depth_to_space(conv2d_s2d(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("train", [False, True])
def test_unet_s2d_level0_matches_plain(rng, train):
    """Full model: s2d_level0=True ≡ False (fwd + BN state), train and eval."""
    config = UNetConfig(3, 2, bilinear=False, base_channels=8)
    config_s2d = config._replace(s2d_level0=True)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3), dtype=np.float32))

    ref, ref_state = unet_apply(params, state, x, config=config, train=train)
    got, got_state = unet_apply(params, state, x, config=config_s2d, train=train)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(ref_state), jax.tree.leaves(got_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_unet_s2d_gradients_match(rng):
    """Same loss gradients through the s2d levels (the train step is what
    the MFU experiment benchmarks)."""
    from tpu_unet.train import compute_loss

    config = UNetConfig(3, 1, bilinear=False, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (2, 32, 32)))

    def loss_fn(p, cfg):
        logits, _ = unet_apply(p, state, x, config=cfg, train=True)
        return compute_loss(logits, masks, 1)

    l1, g1 = jax.value_and_grad(loss_fn)(params, config)
    l2, g2 = jax.value_and_grad(loss_fn)(params, config._replace(s2d_level0=True))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)


def test_double_conv_s2d_first_plain_matches(rng):
    """The first_plain variant (conv1 in the original domain) is the same
    DoubleConv function."""
    from tpu_unet.models.unet import _double_conv_apply, _double_conv_init
    from tpu_unet.ops.s2d import double_conv_s2d

    params, state = _double_conv_init(jax.random.PRNGKey(3), 3, 16)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 3), dtype=np.float32))
    ref, ref_st = _double_conv_apply(params, state, x, train=True)
    got, got_st = double_conv_s2d(params, state, x, train=True, first_plain=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_st), jax.tree.leaves(got_st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_s2d_falls_back_on_odd_shapes(rng):
    """Odd H/W can't space-to-depth; the flag must silently use the plain
    path (identical results)."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    x = jnp.asarray(rng.standard_normal((1, 33, 47, 3), dtype=np.float32))
    ref, _ = unet_apply(params, state, x, config=config, train=False)
    got, _ = unet_apply(params, state, x, config=config._replace(s2d_level0=True),
                        train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
