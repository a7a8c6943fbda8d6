"""Checkpoint round-trip incl. mask_values, and .pth import parity
(SURVEY.md §4.2, §5 checkpoint contract)."""

from pathlib import Path

import numpy as np
import pytest
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


# ---------------------------------------------------------------------------
# .pth EXPORT (torch interop, the other direction): checkpoint.export_pth
# writes a state_dict the canonical upstream U-Net loads with strict=True.
# ---------------------------------------------------------------------------


def _upstream_named_unet(n_ch, n_cls, bilinear, base):
    """A torch U-Net with the canonical UPSTREAM module naming
    (`double_conv`, `maxpool_conv`, `up`, `conv`) — torch_ref.RefUNet
    deliberately renamed its submodules, so strict load_state_dict against
    THIS model is what pins the exporter's key-name contract
    (reference: unet/unet_parts.py module attributes, UNVERIFIED mount,
    SURVEY.md §2 #1-4)."""
    import torch.nn as nn

    class DoubleConv(nn.Module):
        def __init__(self, cin, cout, mid=None):
            super().__init__()
            mid = mid or cout
            self.double_conv = nn.Sequential(
                nn.Conv2d(cin, mid, 3, padding=1, bias=False),
                nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
                nn.Conv2d(mid, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            )

        def forward(self, x):
            return self.double_conv(x)

    class Down(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.maxpool_conv = nn.Sequential(nn.MaxPool2d(2),
                                              DoubleConv(cin, cout))

        def forward(self, x):
            return self.maxpool_conv(x)

    class OutConv(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            return self.conv(x)

    double_conv = DoubleConv
    down = Down

    class Up(nn.Module):
        def __init__(self, cin, cout, bilinear):
            super().__init__()
            if bilinear:
                self.up = nn.Upsample(scale_factor=2, mode="bilinear",
                                      align_corners=True)
                self.conv = double_conv(cin, cout, cin // 2)
            else:
                self.up = nn.ConvTranspose2d(cin, cin // 2, 2, stride=2)
                self.conv = double_conv(cin, cout)

        def forward(self, x1, x2):
            import torch.nn.functional as F
            x1 = self.up(x1)
            dy, dx = x2.size(2) - x1.size(2), x2.size(3) - x1.size(3)
            x1 = F.pad(x1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
            return self.conv(torch.cat([x2, x1], dim=1))

    class UNet(nn.Module):
        def __init__(self):
            super().__init__()
            f = 2 if bilinear else 1
            b = base
            self.inc = double_conv(n_ch, b)
            self.down1 = down(b, b * 2)
            self.down2 = down(b * 2, b * 4)
            self.down3 = down(b * 4, b * 8)
            self.down4 = down(b * 8, b * 16 // f)
            self.up1 = Up(b * 16, b * 8 // f, bilinear)
            self.up2 = Up(b * 8, b * 4 // f, bilinear)
            self.up3 = Up(b * 4, b * 2 // f, bilinear)
            self.up4 = Up(b * 2, b, bilinear)
            self.outc = OutConv(b, n_cls)

        def forward(self, x):
            x1 = self.inc(x)
            x2 = self.down1(x1)
            x3 = self.down2(x2)
            x4 = self.down3(x3)
            x5 = self.down4(x4)
            x = self.up1(x5, x4)
            x = self.up2(x, x3)
            x = self.up3(x, x2)
            x = self.up4(x, x1)
            return self.outc(x)

    return UNet()


def _check_pth_export(tmp_path, bilinear):
    from tpu_unet.checkpoint import export_pth

    config = UNetConfig(3, 2, bilinear=bilinear, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(3), config)
    path = tmp_path / "ours.pth"
    export_pth(path, params, state, bilinear=bilinear, mask_values=[0, 128])

    # (a) numeric round-trip through our own importer: bitwise.
    p2, s2, mv = import_pth(path, config)
    assert mv == [0, 128]
    for a, b in zip(jax.tree.leaves((params, state)), jax.tree.leaves((p2, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) the key-name contract: strict load into an upstream-named torch
    # model, then forward parity of that torch model vs our unet_apply.
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd.pop("mask_values")
    model = _upstream_named_unet(3, 2, bilinear, 8)
    model.load_state_dict(sd, strict=True)  # raises on any key/shape drift
    model.eval()
    x = np.random.default_rng(1).standard_normal((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours, _ = unet_apply(params, state, jnp.asarray(x), config=config, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


def test_pth_export_convtranspose(tmp_path):
    _check_pth_export(tmp_path, bilinear=False)


def test_pth_export_bilinear(tmp_path):
    _check_pth_export(tmp_path, bilinear=True)


def test_pth_export_cli(tmp_path):
    """export CLI with a .pth output: .npz checkpoint -> torch state_dict."""
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.export import main as export_main

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    npz = tmp_path / "ckpt.npz"
    save_checkpoint(npz, params, state, mask_values=[0, 255],
                    extra={"config": config._asdict()})
    out = tmp_path / "model.pth"
    export_main(["-m", str(npz), "-o", str(out), "--check"])
    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert sd["mask_values"] == [0, 255]
    assert "inc.double_conv.0.weight" in sd


def test_average_checkpoints(tmp_path):
    """Uniform average: arrays equal the mean, output loads like any
    checkpoint, metadata rides from the newest input."""
    import sys

    from tpu_unet.checkpoint import average_checkpoints
    from tpu_unet.models import UNetConfig, init_unet

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    p1, s1 = init_unet(jax.random.PRNGKey(1), config)
    p2, s2 = init_unet(jax.random.PRNGKey(2), config)
    a = tmp_path / "a.npz"
    b = tmp_path / "b.npz"
    save_checkpoint(a, p1, s1, mask_values=[0, 1])
    save_checkpoint(b, p2, s2, mask_values=[0, 255],
                    extra={"config": config._asdict(), "epoch": 5})
    out = tmp_path / "avg.npz"
    average_checkpoints([a, b], out)

    pa, sa, mv, extra = load_checkpoint(out, p1, s1)
    assert mv == [0, 255]  # newest input's palette
    assert extra["averaged_from"] == ["a.npz", "b.npz"]
    want = jax.tree.map(lambda x, y: (np.asarray(x, np.float64)
                                      + np.asarray(y, np.float64)) / 2, p1, p2)
    jax.tree.map(lambda got, w: np.testing.assert_allclose(
        np.asarray(got), w.astype(np.float32), rtol=1e-7), pa, want)

    # CLI drives the same path.
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.avg_checkpoints import main as avg_main

    avg_main([str(a), str(b), "-o", str(tmp_path / "avg2.npz")])
    assert (tmp_path / "avg2.npz").exists()

    # Mismatched trees refuse.
    p3, s3 = init_unet(jax.random.PRNGKey(3),
                       UNetConfig(3, 1, bilinear=True, base_channels=16))
    c = tmp_path / "c.npz"
    save_checkpoint(c, p3, s3)
    with pytest.raises(ValueError):
        average_checkpoints([a, c], tmp_path / "bad.npz")


def test_recur_bn_layout_mismatch_gives_clear_error(tmp_path):
    """A shared-layout recurrent checkpoint restored into the (default)
    per-step template must name the fix, not die with a bare KeyError
    (r5 layout change, models/r2u_unet.py)."""
    import pytest

    cfg_shared = UNetConfig(3, 1, bilinear=True, base_channels=8, arch="r2u",
                            recur_bn="shared")
    p, s = init_unet(jax.random.PRNGKey(0), cfg_shared)
    save_checkpoint(tmp_path / "old.npz", p, s)

    cfg_ps = cfg_shared._replace(recur_bn="per_step")
    p2, s2 = init_unet(jax.random.PRNGKey(0), cfg_ps)
    with pytest.raises(KeyError, match="recur_bn='shared'"):
        load_checkpoint(tmp_path / "old.npz", p2, s2)
    # And the reverse direction.
    save_checkpoint(tmp_path / "new.npz", p2, s2)
    with pytest.raises(KeyError, match="per_step"):
        load_checkpoint(tmp_path / "new.npz", p, s)
    # Matching layouts round-trip.
    r_p, r_s, _, _ = load_checkpoint(tmp_path / "new.npz", p2, s2)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(r_p)[0]),
                                  np.asarray(jax.tree.leaves(p2)[0]))
