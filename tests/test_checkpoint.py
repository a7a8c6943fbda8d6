"""Checkpoint round-trip incl. mask_values, and .pth import parity
(SURVEY.md §4.2, §5 checkpoint contract)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import RefUNet
from tpu_unet.checkpoint import import_pth, load_checkpoint, save_checkpoint
from tpu_unet.models import UNetConfig, init_unet, unet_apply


def test_roundtrip_with_mask_values(tmp_path):
    config = UNetConfig(3, 2, bilinear=False, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, params, state, mask_values=[0, 255], extra={"epoch": 3})

    p2, s2 = init_unet(jax.random.PRNGKey(1), config)  # different weights
    p3, s3, mv, extra = load_checkpoint(path, p2, s2)
    assert mv == [0, 255]
    assert extra["epoch"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _check_pth_import(tmp_path, bilinear):
    torch.manual_seed(0)
    model = RefUNet(3, 2, bilinear=bilinear, base=8).eval()
    sd = model.state_dict()
    sd["mask_values"] = [0, 255]  # the reference's palette-in-checkpoint quirk
    path = tmp_path / "ref.pth"
    torch.save(sd, path)

    config = UNetConfig(3, 2, bilinear=bilinear, base_channels=8)
    params, state, mv = import_pth(path, config)
    assert mv == [0, 255]

    x = np.random.default_rng(0).standard_normal((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours, _ = unet_apply(params, state, jnp.asarray(x), config=config, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


def test_pth_import_convtranspose(tmp_path):
    _check_pth_import(tmp_path, bilinear=False)


def test_pth_import_bilinear(tmp_path):
    _check_pth_import(tmp_path, bilinear=True)


def test_save_path_without_npz_suffix(tmp_path):
    """save(path)/load(path) must round-trip even without a .npz suffix
    (bare np.savez silently appends one, ADVICE r1)."""
    from tpu_unet.checkpoint import load_checkpoint, save_checkpoint
    from tpu_unet.models import UNetConfig, init_unet

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    p = tmp_path / "ckpt"  # deliberately suffix-less
    save_checkpoint(p, params, state, mask_values=[0, 1])
    assert p.exists() and not (tmp_path / "ckpt.npz").exists()
    p2, s2 = init_unet(jax.random.PRNGKey(1), config)
    _, _, mv, _ = load_checkpoint(p, p2, s2)
    assert mv == [0, 1]
