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


def test_sharded_corpus_batches_match_host(ds):
    """DP mode: corpus rows sharded over the 8-device mesh, gather under
    GSPMD (out batch sharded on 'data') — values still bit-identical to the
    host DataLoader, and the output carries the requested sharding."""
    from tpu_unet.parallel.mesh import batch_sharding, image_sharding, make_mesh

    mesh = make_mesh()
    assert len(jax.devices()) == 8  # conftest provisions the virtual mesh
    dd = DeviceResidentData(
        ds, data_sharding=batch_sharding(mesh), out_sharding=image_sharding(mesh)
    )
    idx = list(range(len(ds)))
    host = DataLoader(ds, 8, shuffle=True, indices=idx, seed=5, drop_last=True)
    dev = dd.batches(idx, 8, shuffle=True, seed=5, drop_last=True)
    for hb, db in zip(host, dev, strict=True):
        np.testing.assert_array_equal(hb["image"], np.asarray(db["image"]))
        np.testing.assert_array_equal(hb["mask"], np.asarray(db["mask"]))
        assert db["image"].sharding.is_equivalent_to(
            image_sharding(mesh), db["image"].ndim
        )


def test_device_dataset_dp_train_step_matches_single(ds):
    """One DP train epoch fed by the sharded device-resident corpus equals
    the single-device host-pipeline epoch (same global batch, global BN)."""
    from tpu_unet.models import UNetConfig, init_unet
    from tpu_unet.train import train_model

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    kw = dict(dataset=ds, epochs=1, batch_size=8, learning_rate=1e-3,
              val_percent=0.2, save_checkpoint_flag=False, seed=0)
    # Fresh params per run: the fused train step donates its buffers.
    params, state = init_unet(jax.random.PRNGKey(0), config)
    _, _, hist_dp = train_model(params, state, config, device_dataset=True,
                                data_parallel=True, **kw)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    _, _, hist_1d = train_model(params, state, config, **kw)
    np.testing.assert_allclose(
        hist_dp["train_loss"], hist_1d["train_loss"], rtol=2e-5
    )
