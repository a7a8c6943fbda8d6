"""Coverage for the remaining small surfaces: load_image dispatch, the
Carvana→Basic dataset fallback, and the hub entry point."""

import numpy as np
import pytest
from PIL import Image

import jax

from tpu_unet.data import BasicDataset, CarvanaDataset, load_image
from tpu_unet.hub import unet_carvana


def test_load_image_dispatch(tmp_path):
    arr = np.random.default_rng(0).integers(0, 255, (8, 6), dtype=np.uint8).astype(np.uint8)
    np.save(tmp_path / "a.npy", arr)
    assert np.array_equal(np.asarray(load_image(tmp_path / "a.npy")), arr)

    import torch

    torch.save(torch.from_numpy(arr), tmp_path / "b.pt")
    assert np.array_equal(np.asarray(load_image(tmp_path / "b.pt")), arr)

    Image.fromarray(arr).save(tmp_path / "c.png")
    assert np.array_equal(np.asarray(load_image(tmp_path / "c.png")), arr)


def test_carvana_fallback_to_basic(tmp_path):
    """Masks without the _mask suffix → CarvanaDataset fails, BasicDataset
    works (the reference's except-fallback in train.py, SURVEY.md §3.1)."""
    img_dir, mask_dir = tmp_path / "imgs", tmp_path / "masks"
    img_dir.mkdir(), mask_dir.mkdir()
    arr = np.zeros((8, 8, 3), np.uint8)
    Image.fromarray(arr).save(img_dir / "x.png")
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(mask_dir / "x.png")  # no _mask

    with pytest.raises((AssertionError, RuntimeError, IndexError)):
        CarvanaDataset(img_dir, mask_dir, num_workers=0)
    ds = BasicDataset(img_dir, mask_dir, num_workers=0)
    assert len(ds) == 1 and ds[0]["mask"].shape == (8, 8)


def test_hub_unet_carvana_fresh():
    params, state, config, mv = unet_carvana(pretrained=False)
    assert config.n_classes == 2 and not config.bilinear
    assert mv is None
    n = sum(p.size for p in jax.tree.leaves(params))
    assert abs(n / 1e6 - 31.0) < 0.5


def test_hub_pretrained_requires_weights(monkeypatch):
    monkeypatch.delenv("TPU_UNET_WEIGHTS", raising=False)
    with pytest.raises(RuntimeError, match="weights"):
        unet_carvana(pretrained=True)


def test_hub_pretrained_from_npz(tmp_path):
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.models import UNetConfig, init_unet

    config = UNetConfig(3, 2, bilinear=False)
    params, state = init_unet(jax.random.PRNGKey(1), config)
    save_checkpoint(tmp_path / "w.npz", params, state, mask_values=[0, 255])
    p2, s2, cfg, mv = unet_carvana(pretrained=True, weights_path=str(tmp_path / "w.npz"))
    assert mv == [0, 255]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p2)[0]), np.asarray(jax.tree.leaves(params)[0])
    )


def test_torch_hub_protocol_shim():
    """torch.hub.load(<repo>, 'unet_carvana', source='local') resolves through
    the root hubconf.py exactly like the upstream repo (SURVEY.md section 2 #20)."""
    import os

    import torch

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, state, config, mask_values = torch.hub.load(
        repo_root, "unet_carvana", source="local", pretrained=False
    )
    assert config.n_classes == 2 and not config.bilinear
    assert mask_values is None

def test_hub_generic_family_entry(tmp_path):
    """hub.unet(arch=...) builds any family with its canonical decoder and
    round-trips .npz weights; .pth import is refused for non-flagship
    families (no torch release exists to import)."""
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.hub import unet

    p, s, cfg, mv = unet(arch="r2u", base_channels=8, recur_t=3)
    assert cfg.arch == "r2u" and cfg.bilinear and cfg.recur_t == 3

    save_checkpoint(tmp_path / "w.npz", p, s, mask_values=[0, 255])
    p2, s2, cfg2, mv2 = unet(arch="r2u", base_channels=8, recur_t=3,
                             weights_path=str(tmp_path / "w.npz"))
    assert mv2 == [0, 255]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p2)[0]), np.asarray(jax.tree.leaves(p)[0]))

    with pytest.raises(ValueError, match="flagship"):
        unet(arch="unetpp", weights_path="x.pth")


def test_hub_honors_self_describing_checkpoint(tmp_path):
    """A checkpoint carrying its config (as every train-written .npz does)
    wins over mismatched caller args — hub.unet must load it cleanly
    instead of dying in the array restore (ADVICE r4)."""
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.hub import unet
    from tpu_unet.models import UNetConfig, init_unet

    cfg = UNetConfig(3, 2, bilinear=True, base_channels=8, arch="attention")
    p, s = init_unet(jax.random.PRNGKey(0), cfg)
    save_checkpoint(tmp_path / "att.npz", p, s, mask_values=[0, 1],
                    extra={"config": cfg._asdict()})

    # Caller asks for the flagship defaults; the file says attention@8.
    p2, s2, cfg2, mv2 = unet(weights_path=str(tmp_path / "att.npz"))
    assert cfg2 == cfg and mv2 == [0, 1]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p2)[0]), np.asarray(jax.tree.leaves(p)[0]))
