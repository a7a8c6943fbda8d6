"""Device-resident dataset (data/device_cache.py): staging exactness,
shuffle-order parity with the host DataLoader, and CLI e2e."""

import numpy as np
import pytest

import jax

from tpu_unet.data import CarvanaDataset, DataLoader, make_synthetic_carvana
from tpu_unet.data.device_cache import DeviceResidentData


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("ddata")
    make_synthetic_carvana(root, n=10, h=24, w=32)
    return CarvanaDataset(root / "imgs", root / "masks", scale=1.0)


def test_batches_bitexact_vs_host_loader(ds):
    """uint8 staging + /255 on device ≡ the host float pipeline, including
    the per-epoch shuffle order (same reseeding scheme as DataLoader)."""
    idx = list(range(len(ds)))
    dd = DeviceResidentData(ds)
    host = DataLoader(ds, 4, shuffle=True, indices=idx, seed=3)
    dev = dd.batches(idx, 4, shuffle=True, seed=3)
    for _ in range(2):  # two epochs: different orders, both must match
        for hb, db in zip(host, dev, strict=True):
            np.testing.assert_array_equal(hb["image"], np.asarray(db["image"]))
            np.testing.assert_array_equal(hb["mask"], np.asarray(db["mask"]))
            assert db["mask"].dtype == np.int32


def test_val_batches_reiterable(ds):
    dd = DeviceResidentData(ds)
    val = dd.batches([0, 1, 2], 2)
    assert len(val) == 2
    a = [np.asarray(b["image"]) for b in val]
    b = [np.asarray(b["image"]) for b in val]  # evaluate() re-iterates 5x/epoch
    for x, y in zip(a, b, strict=True):
        np.testing.assert_array_equal(x, y)


def test_cli_device_dataset_e2e(tmp_path, monkeypatch):
    from tpu_unet.train import main as train_main

    monkeypatch.chdir(tmp_path)
    make_synthetic_carvana(tmp_path / "data", n=8, h=32, w=48)
    train_main([
        "-e", "1", "-b", "2", "-l", "1e-3", "-s", "1.0",
        "--data-dir", str(tmp_path / "data"),
        "--checkpoint-dir", str(tmp_path / "ckpts"),
        "--device-dataset",
    ])
    assert (tmp_path / "ckpts" / "checkpoint_epoch1.npz").exists()


def test_device_dataset_excludes_dp(ds):
    from tpu_unet.models import UNetConfig, init_unet
    from tpu_unet.train import train_model

    config = UNetConfig(3, 1, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="single-device"):
        train_model(params, state, config, dataset=ds, epochs=1, batch_size=2,
                    learning_rate=1e-3, device_dataset=True, data_parallel=True)
