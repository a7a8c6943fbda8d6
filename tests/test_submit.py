"""RLE submission writer (legacy-layout contingency, SURVEY.md §A.1)."""

import numpy as np

from tpu_unet.submit import rle_decode, rle_encode


def test_rle_round_trip(rng):
    mask = (rng.random((23, 17)) > 0.6).astype(np.uint8)
    assert np.array_equal(rle_decode(rle_encode(mask), mask.shape), mask)


def test_rle_known_value():
    # Column-major, 1-indexed: pixels (r1,c0) and (r2,c0) → start 2, len 2.
    m = np.zeros((3, 3), np.uint8)
    m[1, 0] = m[2, 0] = 1
    assert rle_encode(m) == "2 2"


def test_rle_empty_and_full():
    assert rle_encode(np.zeros((4, 4), np.uint8)) == ""
    assert rle_encode(np.ones((2, 2), np.uint8)) == "1 4"


def test_submit_cli_tta(tmp_path):
    """End-to-end CLI incl. --tta: rows decode back to predict_img(tta=True)."""
    from PIL import Image

    import jax

    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.models import UNetConfig, init_unet
    from tpu_unet.predict import predict_img
    from tpu_unet.submit import main as submit_main

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ckpt = tmp_path / "m.npz"
    # Self-describing checkpoint: submit must rebuild base_channels=8 from
    # the stored config rather than the CLI default.
    save_checkpoint(ckpt, params, state, mask_values=[0, 1],
                    extra={"config": config._asdict()})
    rng_l = np.random.default_rng(0)
    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    img = Image.fromarray((rng_l.random((32, 48, 3)) * 255).astype(np.uint8))
    img.save(in_dir / "a.png")
    out = tmp_path / "SUB.csv"
    submit_main(["-m", str(ckpt), "-i", str(in_dir), "-o", str(out),
                 "-s", "1.0", "--bilinear", "--tta"])
    header, row = out.read_text().strip().splitlines()
    assert header == "img,rle_mask"
    name, rle = row.split(",", 1)
    want = predict_img(params, state, config, img, scale_factor=1.0, tta=True)
    assert np.array_equal(rle_decode(rle, want.shape), want.astype(np.uint8))


def test_submit_batched_matches_per_image(tmp_path):
    """Batched submission (pad-to-batch, shape-grouped) is row-for-row
    identical to per-image prediction, incl. a mixed-shape directory."""
    from PIL import Image

    import jax

    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.models import UNetConfig, init_unet
    from tpu_unet.predict import predict_img
    from tpu_unet.submit import main as submit_main

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, mask_values=[0, 1],
                    extra={"config": config._asdict()})
    rng_l = np.random.default_rng(2)
    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    sizes = [(32, 48), (32, 48), (32, 48), (40, 56), (32, 48), (40, 56)]
    imgs = {}
    for i, (h, w) in enumerate(sizes):
        img = Image.fromarray((rng_l.random((h, w, 3)) * 255).astype(np.uint8))
        name = f"im_{i}.png"
        img.save(in_dir / name)
        imgs[name] = img
    out = tmp_path / "SUB.csv"
    submit_main(["-m", str(ckpt), "-i", str(in_dir), "-o", str(out),
                 "-s", "1.0", "--bilinear", "-b", "4"])
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "img,rle_mask"
    assert len(lines) == 1 + len(sizes)
    for row in lines[1:]:
        name, rle = row.split(",", 1)
        want = predict_img(params, state, config, imgs[name], scale_factor=1.0)
        assert np.array_equal(rle_decode(rle, want.shape),
                              want.astype(np.uint8)), name
