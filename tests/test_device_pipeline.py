"""Device-side preprocessing parity: BIT-EXACT vs Pillow / host preprocess.

The device pipeline reproduces Pillow's fixed-point convolution resampling
in int32 on device (reference: utils/data_loading.py preprocess ~L55,
UNVERIFIED mount, SURVEY.md §2 #9), so --device-preprocess is bitwise-equal
to the host PIL path, not an approximation — every comparison here is
assert_array_equal, no tolerances.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from tpu_unet.data.device_pipeline import (
    device_preprocess_images,
    device_preprocess_masks,
    device_resample_u8,
)
from tpu_unet.data.loading import BasicDataset


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((48, 64), (24, 32)),    # exact /2 downscale (Carvana's scale 0.5)
        ((48, 64), (37, 53)),    # odd, non-integral ratio downscale
        ((40, 56), (13, 47)),    # strong anisotropic downscale
        ((24, 32), (48, 64)),    # upscale (filterscale = 1, no antialias)
        ((48, 64), (48, 32)),    # identity H, downscale W (one-pass path)
        ((48, 64), (24, 64)),    # downscale H, identity W
    ],
)
@pytest.mark.parametrize("channels", [1, 3])
def test_bicubic_bitexact_vs_pil(rng, in_hw, out_hw, channels):
    """Device resample ≡ PIL Image.resize(BICUBIC), every uint8 pixel."""
    shape = (2, *in_hw, channels)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    ours = np.asarray(device_resample_u8(
        jnp.asarray(img), out_h=out_hw[0], out_w=out_hw[1]))
    for n in range(shape[0]):
        pil_in = Image.fromarray(img[n] if channels == 3 else img[n, :, :, 0])
        want = np.asarray(
            pil_in.resize((out_hw[1], out_hw[0]), resample=Image.BICUBIC))
        if channels == 1:
            want = want[..., None]
        np.testing.assert_array_equal(ours[n], want)


def test_device_preprocess_bitexact_vs_host(rng):
    """device_preprocess_images ≡ BasicDataset.preprocess, fp32-bitwise.

    Same resampled pixels, same per-image `/255 iff max > 1` rule — the
    end-to-end claim that makes --device-preprocess a parity path."""
    img = rng.integers(0, 256, (2, 46, 62, 3)).astype(np.uint8)
    got = np.asarray(device_preprocess_images(jnp.asarray(img), out_h=23, out_w=31))
    for n in range(2):
        want = BasicDataset.preprocess(
            None, Image.fromarray(img[n]), 0.5, is_mask=False)
        np.testing.assert_array_equal(got[n], want)


def test_division_rule_per_image():
    """An (almost-)all-dark image whose resize stays ≤ 1 is NOT divided —
    the reference's conditional, applied per image within the batch."""
    imgs = np.zeros((2, 8, 8, 1), np.uint8)
    imgs[1] += 200  # second image takes the /255 branch
    got = np.asarray(device_preprocess_images(jnp.asarray(imgs), out_h=8, out_w=8))
    assert got[0].max() == 0.0
    np.testing.assert_allclose(got[1], 200 / 255.0)
    imgs2 = np.ones((1, 8, 8, 1), np.uint8)  # max == 1 → no division
    got2 = np.asarray(device_preprocess_images(jnp.asarray(imgs2), out_h=8, out_w=8))
    np.testing.assert_array_equal(got2, 1.0)


@pytest.mark.parametrize("out_hw", [(24, 32), (17, 23), (123, 61)])
def test_nearest_mask_matches_pil(rng, out_hw):
    """Device NEAREST mask resize bitwise-matches PIL (accumulated-coordinate
    convention, incl. the 640→123-style boundary-landing columns)."""
    mask = (rng.integers(0, 2, (40, 56)) * 255).astype(np.uint8)
    pil = np.asarray(
        Image.fromarray(mask).resize((out_hw[1], out_hw[0]), resample=Image.NEAREST)
    )
    ours = device_preprocess_masks(
        jnp.asarray(mask[None]), jnp.asarray([0, 255]), out_h=out_hw[0], out_w=out_hw[1]
    )[0]
    # Compare indices: PIL values → indices.
    pil_idx = (pil == 255).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(ours), pil_idx)


def test_rgb_palette_mapping(rng):
    mask = np.zeros((1, 8, 8, 3), np.uint8)
    mask[0, 4:, :] = [255, 0, 0]
    values = jnp.asarray([[0, 0, 0], [255, 0, 0]])
    idx = device_preprocess_masks(jnp.asarray(mask), values, out_h=8, out_w=8)
    assert idx[0, 0, 0] == 0 and idx[0, 7, 0] == 1


def test_raw_u8_for_device_rejects_palette_and_16bit(rng):
    """Eligibility gate for the device preprocess path (code-review r3):
    palette ('P') and bilevel ('1') images decode to indices/bits, not
    intensities — Pillow coerces their resampling to NEAREST, so the
    device BICUBIC path would silently diverge from the host path. 16-bit
    ('I') images violate the u8 fixed-point contract."""
    from tpu_unet.data.device_pipeline import raw_u8_for_device

    rgb = Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
    gray = Image.fromarray(rng.integers(0, 255, (8, 8), dtype=np.uint8))
    pal = rgb.convert("P")
    bilevel = gray.convert("1")
    i16 = Image.fromarray(rng.integers(0, 65535, (8, 8)).astype(np.int32), mode="I")

    arr = raw_u8_for_device(rgb)
    assert arr is not None and arr.shape == (8, 8, 3)
    arr_g = raw_u8_for_device(gray)
    assert arr_g is not None and arr_g.shape == (8, 8, 1)  # HWC'd
    assert raw_u8_for_device(pal) is None
    assert raw_u8_for_device(bilevel) is None
    assert raw_u8_for_device(i16) is None
    # Alpha modes are u8 but Pillow PREMULTIPLIES alpha before resampling
    # (measured 0.2-0.3 divergence) — they must fall back too.
    assert raw_u8_for_device(rgb.convert("RGBA")) is None
    assert raw_u8_for_device(gray.convert("LA")) is None


def test_predict_device_preprocess_palette_falls_back_to_host(tmp_path, rng):
    """predict --device-preprocess on a palette PNG must produce the SAME
    mask as the host path (the bit-parity contract): the P-mode image takes
    the host fallback instead of resampling palette indices."""
    import jax

    from tpu_unet.models import UNetConfig, init_unet
    from tpu_unet.predict import predict_img

    # P-mode decodes to ONE channel of palette indices on both paths (the
    # reference's preprocess does no mode conversion either), so a
    # 1-channel model is the configuration where a P image is consumable
    # at all — and where the old device path silently BICUBIC-resampled
    # indices while the host path NEAREST-resized.
    config = UNetConfig(1, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    rgb = Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))
    pal = rgb.convert("P")

    m_host = predict_img(params, state, config, pal, scale_factor=0.5)
    m_dev = predict_img(params, state, config, pal, scale_factor=0.5,
                        device_preprocess=True)
    np.testing.assert_array_equal(np.asarray(m_host), np.asarray(m_dev))
