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


def _png_bytes(arr, mode=None):
    import io

    bio = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(bio, format="PNG")
    return bio.getvalue()


@pytest.mark.parametrize("mode,shape", [
    ("L", (37, 53)), ("RGB", (37, 53, 3)), ("RGBA", (37, 53, 4)),
    ("LA", (37, 53, 2)),
])
def test_decode_png_parity_with_pillow(mode, shape):
    import io

    rng = np.random.default_rng(sum(shape))
    src = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = _png_bytes(src, mode=mode)
    want = np.asarray(Image.open(io.BytesIO(data)))
    got = native.decode_png(data)
    assert got is not None
    assert np.array_equal(want, got)


def test_decode_png_palette_index_band():
    import io

    rng = np.random.default_rng(5)
    idx = rng.integers(0, 7, size=(41, 29), dtype=np.uint8)
    data = _png_bytes(np.asarray(Image.fromarray(idx).convert("P")))
    pimg = Image.fromarray(idx).convert("P")
    bio = io.BytesIO()
    pimg.save(bio, format="PNG")
    want = np.asarray(Image.open(bio))
    got = native.decode_png(bio.getvalue())
    assert got is not None
    assert np.array_equal(want, got)


def _manual_png(recon, filter_id):
    """Hand-assemble a PNG whose every scanline uses `filter_id`."""
    import struct
    import zlib

    h, w, c = recon.shape
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int32)
    for y in range(h):
        row = recon[y].astype(np.int32)
        if filter_id == 0:
            filt = row
        elif filter_id == 1:  # Sub
            left = np.vstack([np.zeros((1, c), np.int32), row[:-1]])
            filt = row - left
        elif filter_id == 2:  # Up
            filt = row - prev
        elif filter_id == 3:  # Average
            left = np.vstack([np.zeros((1, c), np.int32), row[:-1]])
            filt = row - ((left + prev) >> 1)
        else:  # Paeth
            left = np.vstack([np.zeros((1, c), np.int32), row[:-1]])
            ul = np.vstack([np.zeros((1, c), np.int32), prev[:-1]])
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            filt = row - pred
        raw.append(filter_id)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(typ, payload):
        out = struct.pack(">I", len(payload)) + typ + payload
        return out + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)

    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filter_id", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c", [1, 3, 4])
def test_decode_png_every_filter(filter_id, c):
    """Force each scanline filter (PIL's encoder picks adaptively, so the
    parity tests above don't guarantee coverage of all five)."""
    import io

    rng = np.random.default_rng(filter_id * 10 + c)
    recon = rng.integers(0, 256, size=(13, 17, c), dtype=np.uint8)
    data = _manual_png(recon, filter_id)
    want = np.asarray(Image.open(io.BytesIO(data)))  # PIL accepts it
    got = native.decode_png(data)
    assert got is not None
    assert np.array_equal(want.reshape(13, 17, c), got.reshape(13, 17, c))


def test_decode_png_declines_out_of_scope():
    # 16-bit and interlaced → None (PIL fallback); garbage → None.
    import io

    src = (np.arange(64).reshape(8, 8) * 1021 % 65536).astype(np.uint16)
    bio = io.BytesIO()
    Image.fromarray(src, mode="I;16").save(bio, "PNG")
    assert native.decode_png(bio.getvalue()) is None
    # Interlaced: flip IHDR's interlace byte (offset 8+8+12) to Adam7.
    src8 = np.arange(64, dtype=np.uint8).reshape(8, 8)
    bio2 = io.BytesIO()
    Image.fromarray(src8).save(bio2, "PNG")
    data = bytearray(bio2.getvalue())
    assert data[8 + 8 + 12] == 0
    data[8 + 8 + 12] = 1
    assert native.decode_png(bytes(data)) is None
    assert native.decode_png(b"definitely not a png") is None
    assert native.decode_png(b"") is None


def test_decode_png_rejects_crc_corruption():
    """Pillow raises on critical-chunk CRC mismatch; the native path must
    decline (PIL fallback surfaces the proper error), never misdecode."""
    src = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    data = bytearray(_png_bytes(src))
    # Flip one byte inside the IDAT payload (not its CRC field): find IDAT.
    i = data.find(b"IDAT")
    assert i > 0
    data[i + 6] ^= 0xFF
    assert native.decode_png(bytes(data)) is None
    # IHDR corruption too (flip the stored IHDR CRC itself).
    data2 = bytearray(_png_bytes(src))
    j = data2.find(b"IHDR")
    data2[j + 4 + 13] ^= 0xFF  # first CRC byte after the 13-byte payload
    assert native.decode_png(bytes(data2)) is None


def test_asarray_fast_file_paths(tmp_path):
    rng = np.random.default_rng(8)
    src = rng.integers(0, 256, size=(50, 70, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(src).save(p)
    lazy = Image.open(p)
    want = np.asarray(Image.open(p))
    assert np.array_equal(native.asarray_fast(lazy), want)
    # Already-loaded image takes the PIL route; identical output.
    loaded = Image.open(p)
    loaded.load()
    assert np.array_equal(native.asarray_fast(loaded), want)
    # Non-file image (fromarray) falls back.
    mem = Image.fromarray(src)
    assert np.array_equal(native.asarray_fast(mem), src)


def test_dataset_native_decode_matches_pil(tmp_path):
    """BasicDataset sample with native decode on ≡ native off."""
    from tpu_unet.data.loading import BasicDataset

    rng = np.random.default_rng(13)
    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(2):
        img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        msk = (rng.integers(0, 2, size=(48, 64)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "imgs" / f"s_{i}.png")
        Image.fromarray(msk).save(tmp_path / "masks" / f"s_{i}.png")
    ds_native = BasicDataset(str(tmp_path / "imgs"), str(tmp_path / "masks"),
                             scale=0.7)
    a = ds_native[0]
    native.set_enabled(False)
    try:
        ds_pil = BasicDataset(str(tmp_path / "imgs"), str(tmp_path / "masks"),
                              scale=0.7)
        b = ds_pil[0]
    finally:
        native.set_enabled(True)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["mask"], b["mask"])


def test_env_kill_switch(monkeypatch):
    """TPU_UNET_NATIVE=0 disables the path (state probe honors env)."""
    native.set_enabled(False)
    try:
        pil = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        assert native.pil_resize_native(pil, 4, 4, PIL_BICUBIC) is None
    finally:
        native.set_enabled(True)
    assert native.available()


# ---- JPEG (the real Carvana image format: train_hq.zip ships .jpg) ----


def _jpeg_bytes(img, **kw):
    import io

    bio = io.BytesIO()
    img.save(bio, format="JPEG", **kw)
    return bio.getvalue()


def _lowfreq_image(mode, seed):
    """Upscaled noise — JPEG-typical low-frequency content that exercises
    the chroma upsampling path (pure per-pixel noise would not)."""
    rng = np.random.default_rng(seed)
    shape = (7, 9) if mode == "L" else (7, 9, 3)
    base = rng.integers(0, 256, size=shape, dtype=np.uint8)
    return Image.fromarray(base, mode=mode).resize((120, 88), Image.BICUBIC)


jpeg_mark = pytest.mark.skipif(
    not (native.available() and native._load().tu_has_jpeg),
    reason="libjpeg not linked into the native library",
)


@jpeg_mark
@pytest.mark.parametrize("mode", ["L", "RGB"])
@pytest.mark.parametrize("quality", [50, 85, 100])
@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
@pytest.mark.parametrize("progressive", [False, True])
def test_decode_jpeg_parity_with_pillow(mode, quality, subsampling,
                                        progressive):
    """Bit-parity with Pillow's decoder — the gate under which the loader
    may decode .jpg natively (JPEG decode is only conventionally
    deterministic; both decoders default to islow IDCT + fancy
    upsampling, and this asserts the convention actually holds)."""
    import io

    data = _jpeg_bytes(_lowfreq_image(mode, quality), quality=quality,
                       subsampling=subsampling, progressive=progressive)
    want = np.asarray(Image.open(io.BytesIO(data)))
    got = native.decode_jpeg(data)
    assert got is not None
    assert np.array_equal(want, got)


@jpeg_mark
def test_decode_jpeg_declines_out_of_scope():
    rng = np.random.default_rng(21)
    cmyk = Image.fromarray(
        rng.integers(0, 256, size=(20, 20, 4), dtype=np.uint8), mode="CMYK")
    assert native.decode_jpeg(_jpeg_bytes(cmyk)) is None  # 4-component
    assert native.decode_jpeg(b"definitely not a jpeg") is None
    assert native.decode_jpeg(b"") is None
    # Truncated stream: decline (PIL fallback raises/pads on its own terms).
    data = _jpeg_bytes(_lowfreq_image("RGB", 1), quality=90)
    assert native.decode_jpeg(data[: len(data) // 2]) is None


# ---- GIF (the real Carvana mask format: <id>_mask.gif palette masks) ----


def _gif_bytes(arr):
    import io

    bio = io.BytesIO()
    Image.fromarray(arr, mode="P").save(bio, format="GIF")
    return bio.getvalue()


def _gif_descriptor_offset(data):
    """Offset of the first image descriptor (0x2C block) in a GIF."""
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (1 << ((packed & 7) + 1))
    while data[pos] == 0x21:  # extensions
        pos += 2
        while data[pos] != 0:
            pos += 1 + data[pos]
        pos += 1
    assert data[pos] == 0x2C
    return pos


@pytest.mark.parametrize("hi,shape", [
    (2, (48, 64)), (2, (127, 53)), (7, (60, 80)), (256, (33, 41)),
    (4, (1, 1)),
])
def test_decode_gif_parity_with_pillow(hi, shape):
    """First-frame index band == np.asarray(PIL) — lossless, exact."""
    import io

    rng = np.random.default_rng(hi * 100 + shape[0])
    idx = rng.integers(0, hi, size=shape, dtype=np.uint8)
    data = _gif_bytes(idx)
    want = np.asarray(Image.open(io.BytesIO(data)))
    got = native.decode_gif(data)
    assert got is not None
    assert np.array_equal(want, got)


@pytest.mark.parametrize("interlace", [False, True])
def test_decode_gif_interlace_both_ways(interlace):
    """Pillow interlaces ≥16px GIFs by default; pin BOTH encodings and
    assert the native row (de)ordering matches PIL's exactly."""
    import io

    rng = np.random.default_rng(31)
    idx = rng.integers(0, 5, size=(37, 29), dtype=np.uint8)
    bio = io.BytesIO()
    Image.fromarray(idx, mode="P").save(bio, format="GIF",
                                        interlace=interlace)
    data = bio.getvalue()
    pos = _gif_descriptor_offset(data)
    assert bool(data[pos + 9] & 0x40) == interlace  # encoder honored it
    want = np.asarray(Image.open(io.BytesIO(data)))
    got = native.decode_gif(data)
    assert got is not None
    assert np.array_equal(want, got)
    assert np.array_equal(got, idx)


def test_decode_gif_declines_out_of_scope():
    rng = np.random.default_rng(33)
    idx = rng.integers(0, 3, size=(16, 20), dtype=np.uint8)
    data = bytearray(_gif_bytes(idx))
    # Sub-canvas first frame (left=1): PIL composites, native declines.
    pos = _gif_descriptor_offset(data)
    data[pos + 1] = 1
    assert native.decode_gif(bytes(data)) is None
    assert native.decode_gif(b"GIF89a but corrupt") is None
    assert native.decode_gif(b"") is None
    # Truncated LZW payload must decline, not emit a short image.
    full = _gif_bytes(rng.integers(0, 2, size=(64, 64), dtype=np.uint8))
    assert native.decode_gif(full[: len(full) - 8]) is None


def test_asarray_fast_jpeg_gif_paths(tmp_path):
    rng = np.random.default_rng(41)
    jpg = tmp_path / "car.jpg"
    _lowfreq_image("RGB", 5).save(jpg, quality=92)
    gif = tmp_path / "car_mask.gif"
    Image.fromarray(
        (rng.integers(0, 2, size=(88, 120)) * 255).astype(np.uint8)
    ).save(gif)
    for p in (jpg, gif):
        lazy = Image.open(p)
        want = np.asarray(Image.open(p))
        got = native.asarray_fast(lazy)
        assert got.shape == want.shape
        assert np.array_equal(got, want)


def test_dataset_real_carvana_formats(tmp_path):
    """The REAL upstream file formats (.jpg images + .gif masks): the
    loader handles them end-to-end and the native decode path is
    bit-identical to the PIL route (reference: utils/data_loading.py
    glob id.* + Image.open; UNVERIFIED mount, SURVEY.md §2 #10/#21)."""
    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana

    make_synthetic_carvana(tmp_path, n=3, h=48, w=64,
                           img_format="jpg", mask_format="gif")
    ds = CarvanaDataset(tmp_path / "imgs", tmp_path / "masks", scale=0.5,
                        num_workers=0)
    assert len(ds) == 3
    # GIF masks reopen as palette indices {0, 1} (PIL remaps the L-mode
    # {0, 255} on save — same convention as the real Carvana masks).
    assert ds.mask_values == [0, 1]
    a = ds[0]
    native.set_enabled(False)
    try:
        ds_pil = CarvanaDataset(tmp_path / "imgs", tmp_path / "masks",
                                scale=0.5, num_workers=0)
        b = ds_pil[0]
    finally:
        native.set_enabled(True)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["mask"], b["mask"])
    assert a["image"].shape == (24, 32, 3) and a["mask"].shape == (24, 32)


def test_decoders_survive_fuzzed_inputs():
    """Adversarial bytes must return None (→ PIL fallback raises properly),
    never crash the process: random noise, truncations of VALID files at
    every interesting boundary, and bit flips in the payload."""
    import numpy as np

    from tpu_unet import native

    rng = np.random.default_rng(0)
    arr = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    png = _png_bytes(arr)
    jpg = _jpeg_bytes(Image.fromarray(arr), quality=90)
    gif = _gif_bytes((arr[..., 0] > 127).astype(np.uint8))
    decoders = [(native.decode_png, png), (native.decode_jpeg, jpg),
                (native.decode_gif, gif)]

    for decode, valid in decoders:
        # Sanity: the valid stream decodes (or declines to PIL — PNG/GIF
        # must decode; JPEG may decline if parity failed at import).
        decode(bytes(valid))
        # Random noise at several sizes (incl. 0 and header-sized).
        for n in (0, 1, 6, 13, 64, 1024):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            assert decode(blob) is None
        # Truncations: every prefix length on a coarse grid + the first 40
        # byte-by-byte (headers/descriptors live there). Cuts inside the
        # last 16 bytes may leave a complete payload missing only its
        # trailer (e.g. PNG IEND) — those may decode; everything earlier
        # must decline.
        for cut in list(range(1, min(40, len(valid)))) + list(
                range(40, len(valid), max(1, len(valid) // 37))):
            out = decode(bytes(valid[:cut]))
            if cut < len(valid) - 16:
                assert out is None, f"truncated-at-{cut} stream decoded"
            else:
                assert out is None or out.dtype == np.uint8
        # Payload bit flips: must either decode to SOMETHING of the right
        # dtype or return None — never crash. (JPEG/GIF entropy streams may
        # still decode to altered pixels; that's the format's problem.)
        for pos in rng.integers(12, len(valid) - 5, 24):
            mut = bytearray(valid)
            mut[int(pos)] ^= 0xFF
            out = decode(bytes(mut))
            assert out is None or out.dtype == np.uint8
