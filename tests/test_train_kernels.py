"""Train-path fused conv kernels (kernels/train_conv.py, ops/conv_stats.py):
value AND gradient parity vs the XLA train path, interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_unet.models.unet import _double_conv_apply
from tpu_unet.ops import conv2d
from tpu_unet.ops.batchnorm import init_bn_params, init_bn_state
from tpu_unet.ops.conv_stats import double_conv_train_fused

# Fast-tier exclusion (VERDICT r3 next #3): Pallas custom_vjp train kernels in interpret mode.
pytestmark = pytest.mark.slow


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale)


@pytest.mark.parametrize("shape,cout", [((2, 12, 20, 8), 16), ((1, 9, 33, 16), 8)])
def test_conv3x3_fwd_raw_matches_xla(rng, shape, cout):
    from tpu_unet.kernels.train_conv import conv3x3_fwd

    x = _rand(rng, shape)
    w = _rand(rng, (3, 3, shape[-1], cout), 0.1)
    ref = conv2d(x, w, stride=1, padding=1)
    with pltpu.force_tpu_interpret_mode():
        z, s = conv3x3_fwd(x, w, stats=True, cout_block=cout)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s[0]), np.asarray(jnp.sum(ref, axis=(0, 1, 2))), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s[1]), np.asarray(jnp.sum(ref * ref, axis=(0, 1, 2))), rtol=1e-4
    )


def test_conv3x3_fwd_stats_false(rng):
    """The documented default path (stats=False) must work — pallas_call
    returns a tuple in both modes (self-review r3: it crashed with
    'tuple indices must be integers')."""
    from tpu_unet.kernels.train_conv import conv3x3_fwd

    x = _rand(rng, (1, 8, 16, 8))
    w = _rand(rng, (3, 3, 8, 8), 0.1)
    ref = conv2d(x, w, stride=1, padding=1)
    with pltpu.force_tpu_interpret_mode():
        z = conv3x3_fwd(x, w)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_conv3x3_fwd_prologue_matches_xla(rng):
    from tpu_unet.kernels.train_conv import conv3x3_fwd

    x = _rand(rng, (2, 10, 24, 8))
    w = _rand(rng, (3, 3, 8, 16), 0.1)
    a = _rand(rng, (8,))
    c = _rand(rng, (8,))
    h = jax.nn.relu(x * a + c)
    ref = conv2d(h, w, stride=1, padding=1)
    with pltpu.force_tpu_interpret_mode():
        z, s = conv3x3_fwd(x, w, a, c, stats=True, cout_block=16)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s[0]), np.asarray(jnp.sum(ref, axis=(0, 1, 2))), rtol=1e-4,
        atol=1e-4,
    )


def test_conv3x3_dx_matches_xla_vjp(rng):
    """dz built on the fly (affine in g, z) then SAME-conv with flipped
    weights must equal the XLA conv VJP of the same affine dz."""
    from tpu_unet.kernels.train_conv import conv3x3_dx

    n, h, w_img, cin, cout = 2, 10, 24, 8, 16
    x = _rand(rng, (n, h, w_img, cin))
    w = _rand(rng, (3, 3, cin, cout), 0.1)
    g = _rand(rng, (n, h, w_img, cout))
    z = _rand(rng, (n, h, w_img, cout))
    coef = jnp.stack([jnp.ones(cout), _rand(rng, (cout,)), _rand(rng, (cout,))])
    dz = coef[0] * g + coef[1] * z + coef[2]

    _, vjp = jax.vjp(lambda xx: conv2d(xx, w, stride=1, padding=1), x)
    ref = vjp(dz)[0]
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_dx(g, z, coef, w, cout_block=cin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_conv3x3_dw_matches_xla_vjp(rng):
    from tpu_unet.kernels.train_conv import conv3x3_dw

    n, h, w_img, cin, cout = 2, 10, 24, 8, 16
    x = _rand(rng, (n, h, w_img, cin))
    w = _rand(rng, (3, 3, cin, cout), 0.1)
    g = _rand(rng, (n, h, w_img, cout))
    z = _rand(rng, (n, h, w_img, cout))
    a = _rand(rng, (cin,))
    c = _rand(rng, (cin,))
    coef = jnp.stack([jnp.ones(cout), _rand(rng, (cout,)), _rand(rng, (cout,))])
    dz = coef[0] * g + coef[1] * z + coef[2]
    hsrc = jax.nn.relu(x * a + c)

    _, vjp = jax.vjp(lambda ww: conv2d(hsrc, ww, stride=1, padding=1), w)
    ref = vjp(dz)[0]
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_dw(x, g, z, coef, a, c, cin_block=cin, cout_block=cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)


def _dc_params(rng, cin, cmid, cout):
    params = {
        "conv1": {"w": _rand(rng, (3, 3, cin, cmid), 0.2)},
        "bn1": init_bn_params(cmid),
        "conv2": {"w": _rand(rng, (3, 3, cmid, cout), 0.2)},
        "bn2": init_bn_params(cout),
    }
    # Non-trivial BN affine so prologue/backward paths are exercised.
    params["bn1"]["scale"] = 1.0 + 0.1 * _rand(rng, (cmid,))
    params["bn1"]["bias"] = 0.1 * _rand(rng, (cmid,))
    params["bn2"]["scale"] = 1.0 + 0.1 * _rand(rng, (cout,))
    params["bn2"]["bias"] = 0.1 * _rand(rng, (cout,))
    state = {"bn1": init_bn_state(cmid), "bn2": init_bn_state(cout)}
    return params, state


@pytest.mark.parametrize("cin,cmid,cout", [(8, 16, 16), (3, 8, 8)])
def test_double_conv_train_fused_full_parity(rng, cin, cmid, cout):
    """Forward values, BN running-state update, AND gradients w.r.t. every
    param must match the XLA train path (fp32, loose only to reassociation)."""
    params, state = _dc_params(rng, cin, cmid, cout)
    x = _rand(rng, (2, 12, 20, cin))
    gout = _rand(rng, (2, 12, 20, cout))

    def ref_loss(p, xx):
        y, new_s = _double_conv_apply(p, state, xx, train=True)
        return jnp.sum(y * gout), (y, new_s)

    (ref_val, (ref_y, ref_state)), ref_grads = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True
    )(params, x)

    def fused_loss(p, xx):
        y, new_s = double_conv_train_fused(p, state, xx)
        return jnp.sum(y * gout), (y, new_s)

    with pltpu.force_tpu_interpret_mode():
        (val, (y, new_state)), grads = jax.value_and_grad(
            fused_loss, argnums=(0, 1), has_aux=True
        )(params, x)

    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=2e-4, rtol=1e-3)
    for which in ("bn1", "bn2"):
        np.testing.assert_allclose(
            np.asarray(new_state[which].mean), np.asarray(ref_state[which].mean),
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(new_state[which].var), np.asarray(ref_state[which].var),
            atol=1e-4, rtol=1e-3,
        )
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_grads)
    got_flat = jax.tree_util.tree_leaves_with_path(grads)
    assert len(ref_flat) == len(got_flat)
    for (path, r), (_, g) in zip(ref_flat, got_flat):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-3, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_double_conv_fused_input_needs_grad_false(rng):
    params, state = _dc_params(rng, 3, 8, 8)
    x = _rand(rng, (1, 8, 16, 3))

    def loss(p):
        y, _ = double_conv_train_fused(p, state, x, input_needs_grad=False)
        return jnp.sum(y * y)

    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
