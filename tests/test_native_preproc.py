"""Native C++ preprocessing tier: bit-parity with Pillow and wiring.

The native resampler (tpu_unet/native/preproc.cc) must be BIT-IDENTICAL to
the installed Pillow for every (filter, mode, scale) the loader uses —
that's the condition under which loading.preprocess may route through it
(reference: utils/data_loading.py preprocess resize semantics; UNVERIFIED
mount, SURVEY.md §2 #9).
"""

import numpy as np
import pytest
from PIL import Image

from tpu_unet import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native preproc library unavailable"
)

PIL_NEAREST, PIL_BILINEAR, PIL_BICUBIC = 0, 2, 3
FILTERS = [
    (PIL_NEAREST, native.NEAREST),
    (PIL_BILINEAR, native.BILINEAR),
    (PIL_BICUBIC, native.BICUBIC),
]


@pytest.mark.parametrize("pil_f,nat_f", FILTERS)
@pytest.mark.parametrize(
    "h,w,c", [(37, 53, 1), (480, 640, 3), (77, 123, 3), (479, 641, 1)]
)
def test_bit_parity_with_pillow(pil_f, nat_f, h, w, c):
    rng = np.random.default_rng(h * 1000 + w)
    shape = (h, w) if c == 1 else (h, w, c)
    src = rng.integers(0, 256, size=shape, dtype=np.uint8)
    pil = Image.fromarray(src)
    # Downscale, non-integer-ratio, upscale, identity, extreme aspect.
    for new_w, new_h in [(w // 2, h // 2), (123, 77), (w * 2, h * 2),
                         (w, h), (17, 311), (1, 1)]:
        want = np.asarray(pil.resize((new_w, new_h), resample=pil_f))
        got = native.resize_u8(src, new_h, new_w, nat_f)
        assert np.array_equal(want, got), (
            f"filter={pil_f} {w}x{h}->{new_w}x{new_h}: "
            f"max |Δ|={np.abs(want.astype(int) - got.astype(int)).max()}"
        )


def test_threaded_matches_single_thread():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(321, 457, 3), dtype=np.uint8)
    a = native.resize_u8(src, 200, 300, native.BICUBIC, n_threads=1)
    b = native.resize_u8(src, 200, 300, native.BICUBIC, n_threads=8)
    assert np.array_equal(a, b)


def test_fused_resize_scale_f32():
    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    u8 = native.resize_u8(src, 48, 64, native.BICUBIC)
    fused = native.resize_scale_f32(src, 48, 64, native.BICUBIC, 1 / 255.0)
    want = u8.astype(np.float32) * np.float32(1 / 255.0)
    assert fused.dtype == np.float32
    np.testing.assert_array_equal(fused, want)


def test_palette_mask_nearest():
    """P-mode masks resize their index band exactly like PIL NEAREST."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, size=(60, 80), dtype=np.uint8)
    pil = Image.fromarray(idx).convert("P")
    pil.putpalette([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255] + [0] * 732)
    want = np.asarray(pil.resize((37, 23), resample=PIL_NEAREST))
    got = native.pil_resize_native(pil, 37, 23, PIL_NEAREST)
    assert got is not None
    assert np.array_equal(want, got)


def test_pil_resize_native_declines_unsupported():
    # Conv filter on a P-mode image and non-uint8 modes must fall back.
    pil_p = Image.fromarray(np.zeros((8, 8), np.uint8)).convert("P")
    assert native.pil_resize_native(pil_p, 4, 4, PIL_BICUBIC) is None
    pil_i = Image.fromarray(np.zeros((8, 8), np.int32), mode="I")
    assert native.pil_resize_native(pil_i, 4, 4, PIL_NEAREST) is None


def test_preprocess_routes_through_native_and_matches_pil(monkeypatch):
    """loading.preprocess: native on == native off, bit for bit."""
    from tpu_unet.data.loading import BasicDataset

    rng = np.random.default_rng(11)
    img = Image.fromarray(
        rng.integers(0, 256, size=(100, 144, 3), dtype=np.uint8)
    )
    mask = Image.fromarray(
        (rng.integers(0, 2, size=(100, 144)) * 255).astype(np.uint8)
    )
    out_native_i = BasicDataset.preprocess(None, img, 0.61, is_mask=False)
    out_native_m = BasicDataset.preprocess([0, 255], mask, 0.61, is_mask=True)
    native.set_enabled(False)
    try:
        out_pil_i = BasicDataset.preprocess(None, img, 0.61, is_mask=False)
        out_pil_m = BasicDataset.preprocess([0, 255], mask, 0.61, is_mask=True)
    finally:
        native.set_enabled(True)
    np.testing.assert_array_equal(out_native_i, out_pil_i)
    np.testing.assert_array_equal(out_native_m, out_pil_m)
    assert out_native_i.dtype == np.float32 and out_native_m.dtype == np.int64


def test_env_kill_switch(monkeypatch):
    """TPU_UNET_NATIVE=0 disables the path (state probe honors env)."""
    native.set_enabled(False)
    try:
        pil = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        assert native.pil_resize_native(pil, 4, 4, PIL_BICUBIC) is None
    finally:
        native.set_enabled(True)
    assert native.available()
