"""Data pipeline semantics (SURVEY.md §2 #7–#10, §4.2)."""

import numpy as np
import pytest
from PIL import Image

from tpu_unet.data import (
    BasicDataset,
    CarvanaDataset,
    DataLoader,
    make_synthetic_carvana,
    random_split_indices,
)
from tpu_unet.data.loading import unique_mask_values


@pytest.fixture(scope="module")
def carvana_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("carvana")
    make_synthetic_carvana(root, n=6, h=48, w=64)
    return root


def test_carvana_dataset_scan(carvana_dir):
    ds = CarvanaDataset(carvana_dir / "imgs", carvana_dir / "masks", scale=1.0, num_workers=0)
    assert len(ds) == 6
    assert ds.mask_values == [0, 255]
    sample = ds[0]
    assert sample["image"].shape == (48, 64, 3)
    assert sample["image"].dtype == np.float32
    assert sample["image"].max() <= 1.0
    assert sample["mask"].shape == (48, 64)
    assert set(np.unique(sample["mask"])) <= {0, 1}


def test_preprocess_scale_and_dtype(carvana_dir):
    ds = CarvanaDataset(carvana_dir / "imgs", carvana_dir / "masks", scale=0.5, num_workers=0)
    s = ds[0]
    # int(scale*dim) truncation, reference semantics.
    assert s["image"].shape == (24, 32, 3)
    assert s["mask"].shape == (24, 32)


def test_preprocess_resample_filters():
    """Masks must go through NEAREST (no new values), images through BICUBIC."""
    mask_img = Image.fromarray((np.arange(64 * 64).reshape(64, 64) % 2 * 255).astype(np.uint8))
    out = BasicDataset.preprocess([0, 255], mask_img, 0.37, is_mask=True)
    assert set(np.unique(out)) <= {0, 1}
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8).astype(np.uint8))
    arr = BasicDataset.preprocess(None, img, 0.37, is_mask=False)
    assert arr.shape == (23, 23, 3) and arr.dtype == np.float32 and arr.max() <= 1.0


def test_preprocess_rejects_tiny_scale(carvana_dir):
    ds = CarvanaDataset(carvana_dir / "imgs", carvana_dir / "masks", scale=1.0, num_workers=0)
    img = Image.new("RGB", (4, 4))
    with pytest.raises(AssertionError, match="Scale is too small"):
        BasicDataset.preprocess(None, img, 0.1, is_mask=False)


def test_rgb_mask_values(tmp_path):
    """HxWx3 RGB masks produce sorted unique RGB triples (SURVEY.md §2 #7)."""
    img_dir, mask_dir = tmp_path / "imgs", tmp_path / "masks"
    img_dir.mkdir(); mask_dir.mkdir()
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[4:, :] = [255, 0, 0]
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "a.png")
    Image.fromarray(rgb).save(mask_dir / "a.png")
    ds = BasicDataset(img_dir, mask_dir, num_workers=0)
    assert ds.mask_values == [[0, 0, 0], [255, 0, 0]]
    m = ds[0]["mask"]
    assert m[0, 0] == 0 and m[7, 0] == 1


def test_empty_dir_raises(tmp_path):
    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    with pytest.raises(RuntimeError, match="No input file"):
        BasicDataset(tmp_path / "imgs", tmp_path / "masks", num_workers=0)


def test_random_split_matches_torch():
    """Split must equal torch random_split(manual_seed(0)) (SURVEY.md §3.1)."""
    import torch
    from torch.utils.data import random_split

    n, val_percent = 20, 0.1
    n_val = int(n * val_percent)
    ref_train, ref_val = random_split(
        range(n), [n - n_val, n_val],
        generator=torch.Generator().manual_seed(0),
    )
    ours_train, ours_val = random_split_indices(n, val_percent, seed=0)
    assert ours_train == list(ref_train.indices)
    assert ours_val == list(ref_val.indices)


def test_dataloader_batching(carvana_dir):
    ds = CarvanaDataset(carvana_dir / "imgs", carvana_dir / "masks", scale=1.0, num_workers=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 48, 64, 3)
    assert batches[1]["image"].shape == (2, 48, 64, 3)
    # Shuffle must differ between epochs but be seed-reproducible.
    again = list(loader)
    assert len(again) == 2


def test_collate_preserves_uint8():
    """uint8 frames stay uint8 through collate so --device-preprocess ships
    1 byte/px over H2D, not 4 (ADVICE r1); float inputs standardize to f32."""
    import numpy as np

    from tpu_unet.data.prefetch import collate

    u8 = [{"image": np.zeros((4, 4, 3), np.uint8), "mask": np.zeros((4, 4), np.int64)}]
    assert collate(u8)["image"].dtype == np.uint8
    f64 = [{"image": np.zeros((4, 4, 3), np.float64), "mask": np.zeros((4, 4), np.int64)}]
    assert collate(f64)["image"].dtype == np.float32


def test_dataset_ram_cache(tmp_path):
    """cache=True: second access returns the identical cached sample without
    re-decoding (file can disappear); cache off re-reads from disk."""
    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana

    make_synthetic_carvana(tmp_path, n=2, h=16, w=24)
    ds = CarvanaDataset(tmp_path / "imgs", tmp_path / "masks", scale=1.0, cache=True)
    a = ds[0]
    (tmp_path / "imgs" / "car_0000.png").unlink()  # prove no re-decode
    b = ds[0]
    assert a is b
    np.testing.assert_array_equal(a["image"], b["image"])

    ds2 = CarvanaDataset(tmp_path / "imgs", tmp_path / "masks", scale=1.0)
    assert ds2[0] is not ds2[0]  # uncached path re-decodes each access
