"""Pallas kernel correctness vs the XLA path (interpret mode on CPU) and the
folded-BN inference path vs the reference train=False forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.kernels.fused_conv import fused_conv3x3_scale_relu
from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.models.infer import fold_bn, unet_infer_apply
from tpu_unet.ops import conv2d


@pytest.mark.parametrize("shape,cout", [((1, 16, 24, 8), 16), ((2, 8, 128, 128), 128)])
def test_fused_conv_matches_xla(rng, shape, cout):
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout), dtype=np.float32) * 0.1)
    scale = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))

    ref = jax.nn.relu(conv2d(x, w, stride=1, padding=1) * scale + bias)
    with pltpu.force_tpu_interpret_mode():
        out = fused_conv3x3_scale_relu(x, w, scale, bias)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_conv_no_relu(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8), dtype=np.float32) * 0.1)
    ones = jnp.ones(8)
    zeros = jnp.zeros(8)
    ref = conv2d(x, w, stride=1, padding=1)
    with pltpu.force_tpu_interpret_mode():
        out = fused_conv3x3_scale_relu(x, w, ones, zeros, apply_relu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(1, 16, 24, 8), (2, 17, 25, 4), (1, 64, 64, 3)])
def test_pallas_maxpool_matches_torch_semantics(rng, shape):
    from tpu_unet.kernels.pooling import max_pool2x2
    from tpu_unet.ops import max_pool2d

    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    ref = max_pool2d(x)  # itself torch-parity-tested in test_ops.py
    with pltpu.force_tpu_interpret_mode():
        out = max_pool2x2(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("bilinear", [False, True])
def test_folded_bn_inference_matches_train_false(bilinear):
    """fold_bn + unet_infer_apply(xla) ≡ unet_apply(train=False)."""
    config = UNetConfig(3, 2, bilinear=bilinear, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    # Perturb BN state so folding is non-trivial.
    state = jax.tree.map(lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype) / a.size, state)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 48, 32, 3), dtype=np.float32)
    )
    ref, _ = unet_apply(params, state, x, config=config, train=False)
    folded = fold_bn(params, state, config)
    out = unet_infer_apply(folded, x, config=config, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("hw", [(12, 20), (16, 60)])  # 60: wb rounds up to 64
def test_fused_double_conv_matches_chained_hw(rng, hw):
    from tpu_unet.kernels.fused_double_conv import fused_double_conv

    x = jnp.asarray(rng.standard_normal((1, *hw, 8), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 8, 16), dtype=np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 16), dtype=np.float32) * 0.2)
    s1, b1 = jnp.asarray(rng.standard_normal(16, dtype=np.float32)), jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    s2, b2 = jnp.asarray(rng.standard_normal(16, dtype=np.float32)), jnp.asarray(rng.standard_normal(16, dtype=np.float32))

    mid = jax.nn.relu(conv2d(x, w1, stride=1, padding=1) * s1 + b1)
    ref = jax.nn.relu(conv2d(mid, w2, stride=1, padding=1) * s2 + b2)
    with pltpu.force_tpu_interpret_mode():
        out = fused_double_conv(x, w1, s1, b1, w2, s2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_fused_double_conv_matches_chained(rng):
    from tpu_unet.kernels.fused_double_conv import fused_double_conv

    x = jnp.asarray(rng.standard_normal((1, 12, 20, 8), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 8, 16), dtype=np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 16), dtype=np.float32) * 0.2)
    s1, b1 = jnp.asarray(rng.standard_normal(16, dtype=np.float32)), jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    s2, b2 = jnp.asarray(rng.standard_normal(16, dtype=np.float32)), jnp.asarray(rng.standard_normal(16, dtype=np.float32))

    mid = jax.nn.relu(conv2d(x, w1, stride=1, padding=1) * s1 + b1)
    ref = jax.nn.relu(conv2d(mid, w2, stride=1, padding=1) * s2 + b2)
    with pltpu.force_tpu_interpret_mode():
        out = fused_double_conv(x, w1, s1, b1, w2, s2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_fused_concat_conv_matches_concat_path(rng):
    from tpu_unet.kernels.fused_conv import fused_conv3x3_concat_scale_relu

    a = jnp.asarray(rng.standard_normal((1, 12, 20, 8), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((1, 12, 20, 16), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 24, 16), dtype=np.float32) * 0.2)
    s = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(16, dtype=np.float32))

    ref = jax.nn.relu(
        conv2d(jnp.concatenate([a, b], -1), w, stride=1, padding=1) * s + bias
    )
    with pltpu.force_tpu_interpret_mode():
        out = fused_conv3x3_concat_scale_relu(a, b, w, s, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("shape,cout", [((1, 16, 24, 8), 16), ((2, 13, 20, 16), 8)])
def test_im2col_conv_matches_xla(rng, shape, cout):
    """im2col formulation (K=9·Cin single matmul) ≡ XLA conv + scale/bias[+relu],
    including odd H/W slab remainders."""
    from tpu_unet.kernels.im2col_conv import im2col_conv3x3

    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout), dtype=np.float32) * 0.1)
    s = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    ref = conv2d(x, w, stride=1, padding=1) * s + b
    with pltpu.force_tpu_interpret_mode():
        out = im2col_conv3x3(x, w, s, b)
        out_m = im2col_conv3x3(x, w, s, b, merged=True)
        out_r = im2col_conv3x3(x, w, s, b, apply_relu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_r), np.asarray(jax.nn.relu(ref)), atol=1e-4, rtol=1e-4
    )


def test_folded_pallas_inference_matches_xla():
    config = UNetConfig(3, 2, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    folded = fold_bn(params, state, config)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 32, 3), dtype=np.float32)
    )
    ref = unet_infer_apply(folded, x, config=config, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        out = unet_infer_apply(folded, x, config=config, backend="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)
