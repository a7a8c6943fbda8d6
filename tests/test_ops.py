"""Op-level torch parity (SURVEY.md §4.2, hard parts #1 and #3)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpu_unet.ops import (
    batch_norm,
    conv2d,
    conv_transpose2d,
    init_bn_params,
    init_bn_state,
    max_pool2d,
    pad_to_match,
    resize_bilinear,
    upsample2x_align_corners,
)
from tpu_unet.ops.batchnorm import BNState


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def to_nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("stride,padding", [(1, 1), (1, 0), (2, 1)])
def test_conv2d_matches_torch(rng, stride, padding):
    x = rng.standard_normal((2, 13, 17, 5), dtype=np.float32)
    w = rng.standard_normal((3, 3, 5, 7), dtype=np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=padding)
    theirs = F.conv2d(
        nchw(x), torch.from_numpy(w).permute(3, 2, 0, 1).contiguous(),
        stride=stride, padding=padding,
    )
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), atol=1e-4, rtol=1e-4)


def test_conv_transpose2d_matches_torch(rng):
    # The reference's ConvTranspose2d(in, in//2, kernel=2, stride=2).
    x = rng.standard_normal((2, 9, 11, 8), dtype=np.float32)
    w_torch = rng.standard_normal((8, 4, 2, 2), dtype=np.float32)  # (I, O, kH, kW)
    w_jax = jnp.asarray(w_torch.transpose(2, 3, 0, 1))  # HWIO
    ours = conv_transpose2d(jnp.asarray(x), w_jax, stride=2)
    theirs = F.conv_transpose2d(nchw(x), torch.from_numpy(w_torch), stride=2)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("hw", [(8, 8), (9, 11)])
def test_max_pool2d_matches_torch(rng, hw):
    x = rng.standard_normal((2, *hw, 3), dtype=np.float32)
    ours = max_pool2d(jnp.asarray(x))
    theirs = F.max_pool2d(nchw(x), 2)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), atol=0, rtol=0)


def test_upsample2x_align_corners_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 4), dtype=np.float32)
    ours = upsample2x_align_corners(jnp.asarray(x))
    theirs = F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("out_hw", [(30, 40), (959, 640), (5, 3)])
def test_resize_bilinear_half_pixel_matches_torch(rng, out_hw):
    # predict_img's F.interpolate(..., mode='bilinear') back to original size.
    x = rng.standard_normal((1, 12, 10, 2), dtype=np.float32)
    ours = resize_bilinear(jnp.asarray(x), *out_hw, align_corners=False)
    theirs = F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), atol=1e-4, rtol=1e-4)


def test_pad_to_match_odd_sizes(rng):
    # 959-wide image at /16 → skip differs by 1px (SURVEY.md §3.3).
    x1 = jnp.asarray(rng.standard_normal((1, 4, 5, 2), dtype=np.float32))
    x2 = jnp.zeros((1, 7, 8, 2))
    padded = pad_to_match(x1, x2)
    assert padded.shape == (1, 7, 8, 2)
    t = F.pad(nchw(np.asarray(x1)), [3 // 2, 3 - 3 // 2, 3 // 2, 3 - 3 // 2])
    np.testing.assert_array_equal(np.asarray(padded), to_nhwc(t))


def test_batch_norm_train_and_eval_match_torch(rng):
    x = rng.standard_normal((4, 6, 6, 5), dtype=np.float32)
    bn_t = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        bn_t.weight.copy_(torch.from_numpy(rng.standard_normal(5, dtype=np.float32)))
        bn_t.bias.copy_(torch.from_numpy(rng.standard_normal(5, dtype=np.float32)))
    params = {
        "scale": jnp.asarray(bn_t.weight.detach().numpy()),
        "bias": jnp.asarray(bn_t.bias.detach().numpy()),
    }
    state = init_bn_state(5)

    # Train mode: output + running stat update.
    bn_t.train()
    out_t = bn_t(nchw(x))
    out_j, new_state = batch_norm(jnp.asarray(x), params, state, train=True)
    np.testing.assert_allclose(np.asarray(out_j), to_nhwc(out_t), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.mean), bn_t.running_mean.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.var), bn_t.running_var.numpy(), atol=1e-5, rtol=1e-5
    )

    # Eval mode with the updated stats.
    bn_t.eval()
    out_t = bn_t(nchw(x))
    out_j, _ = batch_norm(jnp.asarray(x), params, new_state, train=False)
    np.testing.assert_allclose(np.asarray(out_j), to_nhwc(out_t), atol=1e-4, rtol=1e-4)


def test_bn_near_constant_channel_no_nan():
    """One-pass E[x^2]-E[x]^2 variance must clamp to >=0: a near-constant
    channel with |mean| >> sigma can cancel slightly negative in fp32 and
    rsqrt would NaN the whole step."""
    from tpu_unet.ops import batch_norm, init_bn_params, init_bn_state

    x = jnp.full((4, 37, 53, 8), 5.0, jnp.float32)
    x = x + jnp.linspace(0, 1e-6, x.size).reshape(x.shape)  # epsilon jitter
    y, st = batch_norm(x, init_bn_params(8), init_bn_state(8), train=True)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(st.var)).all() and (np.asarray(st.var) >= 0).all()
