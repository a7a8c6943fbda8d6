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


def test_sharded_gather_nondivisible_batch_falls_back(ds):
    """A val-split trailing batch (no drop_last) that doesn't divide the
    mesh must gather via the unsharded fallback, not crash the jitted
    sharded gather (self-review r3: --data-parallel --device-dataset at
    default -b 1 failed at step 1)."""
    from tpu_unet.parallel.mesh import batch_sharding, image_sharding, make_mesh

    mesh = make_mesh()
    dd = DeviceResidentData(ds, data_sharding=batch_sharding(mesh),
                            out_sharding=image_sharding(mesh))
    ref = DeviceResidentData(ds)
    # 10 samples, batch 8 -> one sharded batch of 8 and a trailing 2.
    got = list(dd.batches(list(range(10)), 8))
    want = list(ref.batches(list(range(10)), 8))
    assert [b["image"].shape[0] for b in got] == [8, 2]
    for g, w in zip(got, want, strict=True):
        np.testing.assert_array_equal(np.asarray(g["image"]), np.asarray(w["image"]))
        np.testing.assert_array_equal(np.asarray(g["mask"]), np.asarray(w["mask"]))


def test_tiny_corpus_pads_past_n(tmp_path):
    """Corpus smaller than the shard count: pad rows must repeat cyclically
    (a [:pad] slice under-pads and device_put fails divisibility)."""
    from tpu_unet.parallel.mesh import batch_sharding, make_mesh

    make_synthetic_carvana(tmp_path / "t", n=3, h=16, w=16)
    tiny = CarvanaDataset(tmp_path / "t" / "imgs", tmp_path / "t" / "masks", scale=1.0)
    mesh = make_mesh()  # 8 devices; pad = (-3) % 8 = 5 > n = 3
    dd = DeviceResidentData(tiny, data_sharding=batch_sharding(mesh))
    ref = DeviceResidentData(tiny)
    (g,) = list(dd.batches([0, 1, 2], 3))
    (w,) = list(ref.batches([0, 1, 2], 3))
    np.testing.assert_array_equal(np.asarray(g["image"]), np.asarray(w["image"]))
