"""RawDataset + DevicePipeline train path (the --device-preprocess flow)."""

import numpy as np

import jax

from tpu_unet.data import make_synthetic_carvana
from tpu_unet.data.loading import RawCarvanaDataset
from tpu_unet.data.device_pipeline import DevicePipeline
from tpu_unet.data.prefetch import DataLoader
from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.train import train_model


def test_raw_dataset_and_pipeline(tmp_path):
    make_synthetic_carvana(tmp_path, n=6, h=40, w=56)
    ds = RawCarvanaDataset(tmp_path / "imgs", tmp_path / "masks", scale=0.5, num_workers=0)
    assert (ds.raw_h, ds.raw_w) == (40, 56)
    s = ds[0]
    assert s["image"].dtype == np.uint8 and s["image"].shape == (40, 56, 3)

    loader = DataLoader(ds, batch_size=2, num_workers=0)
    pipe = DevicePipeline(loader, ds.mask_values, 0.5, ds.raw_h, ds.raw_w)
    batch = next(iter(pipe))
    assert batch["image"].shape == (2, 20, 28, 3)
    assert float(batch["image"].max()) <= 1.0
    assert batch["mask"].shape == (2, 20, 28)
    assert set(np.unique(np.asarray(batch["mask"]))) <= {0, 1}


def test_device_preprocess_training(tmp_path):
    make_synthetic_carvana(tmp_path / "d", n=6, h=32, w=32)
    ds = RawCarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                           scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    _, _, hist = train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=2,
        learning_rate=1e-3, val_percent=0.2, checkpoint_dir=tmp_path / "ck",
        device_preprocess=True, seed=0,
    )
    assert len(hist["train_loss"]) == 3 and all(np.isfinite(hist["train_loss"]))
