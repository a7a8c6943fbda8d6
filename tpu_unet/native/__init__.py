"""Native (C++) host-runtime tier: ctypes bindings + build-on-demand.

The reference's host hot path (decode → resize → normalize) runs in
torch/Pillow C internals (reference: utils/data_loading.py preprocess,
UNVERIFIED mount, SURVEY.md §2 #9). This package is the framework's own
native equivalent: `preproc.cc` reimplements Pillow's fixed-point
convolution resampling bit-exactly, adds row-parallel threading and a fused
resize→float32 normalize; `decode.cc` decodes 8-bit PNGs (zlib inflate +
unfilter), `jpeg.cc` decodes JPEGs (system libjpeg — the real Carvana
images are .jpg) and `gif.cc` decodes first-frame GIF index bands (pure
LZW — the real Carvana masks are .gif), so the whole
decode→resize→normalize chain runs outside Python for every format the
upstream dataset ships.
Both are loaded here via ctypes (no pybind11 in the image; ctypes releases
the GIL for the call, so Python loader thread pools scale across images
while each call can also thread across rows).

Safety policy — parity first:
  * The .so is built on demand with g++ (-O3, no external deps) and cached
    in `_build/` keyed by a source hash.
  * Before the native path is ever used, `self_check()` asserts
    bit-exactness against the installed Pillow on random images for every
    (filter, channel-count) combination used by the loader. Any mismatch
    (e.g. a future Pillow changing conventions) disables the path with a
    warning and the PIL route is used — identical results, just slower.
  * `TPU_UNET_NATIVE=0` disables it outright; `set_enabled(False)` too.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).with_name("preproc.cc")
_BUILD_DIR = Path(__file__).with_name("_build")

# Pillow filter ids → native filter ids (preproc.cc FilterId).
NEAREST, BILINEAR, BICUBIC = 0, 1, 2
_PIL_TO_NATIVE = {0: NEAREST, 2: BILINEAR, 3: BICUBIC}  # PIL.Image constants

_lock = threading.Lock()
_lib = None  # ctypes.CDLL once loaded
_state = "unknown"  # unknown | ok | disabled | failed


def _sources() -> list[Path]:
    return sorted(Path(__file__).parent.glob("*.cc"))


def _source_hash() -> str:
    h = hashlib.sha256()
    for src in _sources():
        h.update(src.name.encode())
        h.update(src.read_bytes())
    return h.hexdigest()[:16]


def _so_path() -> Path:
    return _BUILD_DIR / f"libtpu_unet_preproc-{_source_hash()}.so"


def build(force: bool = False) -> Path:
    """Compile preproc.cc into a cached shared library; return its path."""
    so = _so_path()
    if so.exists() and not force:
        return so
    _BUILD_DIR.mkdir(exist_ok=True)
    tmp = so.with_suffix(f".tmp{os.getpid()}.so")
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]
    cmd = [*base, *[str(s) for s in _sources()], "-o", str(tmp),
           "-lz", "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=120)
    except subprocess.CalledProcessError as e:
        # jpeg.cc is the only external-library dependency beyond zlib; a
        # host without libjpeg keeps PNG/GIF/resize (JPEG declines at bind
        # time and those files fall back to PIL).
        no_jpeg = [s for s in _sources() if s.name != "jpeg.cc"]
        cmd = [*base, *[str(s) for s in no_jpeg], "-o", str(tmp), "-lz"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True,
                           timeout=120)
            logger.warning("native jpeg decode unavailable (%s); "
                           "JPEG files use PIL", (e.stderr or "")[-200:])
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
                FileNotFoundError) as e2:
            detail = getattr(e2, "stderr", "") or str(e2)
            raise RuntimeError(
                f"native preproc build failed: {detail}") from e2
    except (subprocess.TimeoutExpired, FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise RuntimeError(f"native preproc build failed: {detail}") from e
    tmp.replace(so)  # atomic vs concurrent builders
    # Keep the cache dir tidy: drop stale hashes.
    for old in _BUILD_DIR.glob("libtpu_unet_preproc-*.so"):
        if old != so and ".tmp" not in old.name:
            try:
                old.unlink()
            except OSError:
                pass
    logger.info("built native preproc: %s", so.name)
    return so


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.tu_resize_u8.restype = ctypes.c_int
    lib.tu_resize_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.tu_resize_scale_f32.restype = ctypes.c_int
    lib.tu_resize_scale_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_int,
    ]
    lib.tu_u8_to_f32.restype = ctypes.c_int
    lib.tu_u8_to_f32.argtypes = [
        u8p, ctypes.c_int64, f32p, ctypes.c_float, ctypes.c_int,
    ]
    intp = ctypes.POINTER(ctypes.c_int)
    lib.tu_png_probe.restype = ctypes.c_int
    lib.tu_png_probe.argtypes = [u8p, ctypes.c_int64, intp, intp, intp, intp]
    lib.tu_png_decode.restype = ctypes.c_int
    lib.tu_png_decode.argtypes = [u8p, ctypes.c_int64, u8p]
    lib.tu_gif_probe.restype = ctypes.c_int
    lib.tu_gif_probe.argtypes = [u8p, ctypes.c_int64, intp, intp]
    lib.tu_gif_decode.restype = ctypes.c_int
    lib.tu_gif_decode.argtypes = [u8p, ctypes.c_int64, u8p]
    try:  # absent when the build fell back to the no-libjpeg variant
        lib.tu_jpeg_probe.restype = ctypes.c_int
        lib.tu_jpeg_probe.argtypes = [u8p, ctypes.c_int64, intp, intp, intp]
        lib.tu_jpeg_decode.restype = ctypes.c_int
        lib.tu_jpeg_decode.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.tu_has_jpeg = True
    except AttributeError:
        lib.tu_has_jpeg = False
    return lib


def _load() -> ctypes.CDLL | None:
    global _lib, _state
    with _lock:
        if _state == "ok":
            return _lib
        if _state in ("disabled", "failed"):
            return None
        if os.environ.get("TPU_UNET_NATIVE", "1") in ("0", "false", "off"):
            _state = "disabled"
            logger.info("native preproc disabled via TPU_UNET_NATIVE")
            return None
        try:
            _lib = _bind(ctypes.CDLL(str(build())))
        except (RuntimeError, OSError) as e:
            _state = "failed"
            logger.warning("native preproc unavailable (%s); using PIL", e)
            return None
        if not _self_check(_lib):
            _state = "failed"
            _lib = None
            logger.warning(
                "native preproc failed the Pillow bit-parity self-check "
                "(Pillow convention change?); using PIL"
            )
            return None
        _state = "ok"
        return _lib


def _as_hwc(arr: np.ndarray) -> tuple[np.ndarray, int, bool]:
    """(contiguous HWC view, channels, was_2d)."""
    was_2d = arr.ndim == 2
    if was_2d:
        arr = arr[:, :, None]
    return np.ascontiguousarray(arr), arr.shape[2], was_2d


def _default_threads() -> int:
    """Row-parallelism default: 1, or TPU_UNET_NATIVE_THREADS (serving
    hosts with many cores can cut single-image latency; thread count never
    changes results — asserted by test_threaded_matches_single_thread)."""
    try:
        return max(1, int(os.environ.get("TPU_UNET_NATIVE_THREADS", "1")))
    except ValueError:
        return 1


def resize_u8(arr: np.ndarray, new_h: int, new_w: int, filter: int,
              n_threads: int | None = None) -> np.ndarray:
    """Resize a uint8 HW / HWC array; bit-exact Pillow semantics."""
    if n_threads is None:
        n_threads = _default_threads()
    lib = _load()
    if lib is None:
        raise RuntimeError("native preproc not available")
    src, c, was_2d = _as_hwc(arr)
    if src.dtype != np.uint8:
        raise TypeError(f"resize_u8 needs uint8, got {src.dtype}")
    h, w = src.shape[:2]
    dst = np.empty((new_h, new_w, c), dtype=np.uint8)
    rc = lib.tu_resize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), new_h, new_w,
        filter, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"tu_resize_u8 rc={rc}")
    return dst[:, :, 0] if was_2d else dst


def resize_scale_f32(arr: np.ndarray, new_h: int, new_w: int, filter: int,
                     scale: float, n_threads: int | None = None) -> np.ndarray:
    """Fused resize → float32*scale; == resize_u8(...).astype(f32)*scale."""
    if n_threads is None:
        n_threads = _default_threads()
    lib = _load()
    if lib is None:
        raise RuntimeError("native preproc not available")
    src, c, was_2d = _as_hwc(arr)
    if src.dtype != np.uint8:
        raise TypeError(f"resize_scale_f32 needs uint8, got {src.dtype}")
    h, w = src.shape[:2]
    dst = np.empty((new_h, new_w, c), dtype=np.float32)
    rc = lib.tu_resize_scale_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), new_h, new_w,
        filter, scale, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"tu_resize_scale_f32 rc={rc}")
    return dst[:, :, 0] if was_2d else dst


def decode_png(data: bytes) -> np.ndarray | None:
    """Decode a PNG byte string natively; None when out of scope.

    Returns HW (gray / palette index band) or HWC uint8 — exactly what
    ``np.asarray(PIL.Image.open(...))`` gives for the same bytes. Scope:
    8-bit non-interlaced gray/RGB/LA/RGBA/palette (decode.cc); anything
    else (16-bit, interlaced, 1-bit, non-PNG) returns None for PIL
    fallback.
    """
    lib = _load()
    if lib is None:
        return None
    return _decode_png_raw(lib, data)


def _decode_png_raw(lib: ctypes.CDLL, data: bytes) -> np.ndarray | None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    pal = ctypes.c_int()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    src = ctypes.cast(buf, u8p)
    if lib.tu_png_probe(src, len(data), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c), ctypes.byref(pal)) != 0:
        return None
    dst = np.empty((h.value, w.value, c.value), dtype=np.uint8)
    if lib.tu_png_decode(src, len(data), dst.ctypes.data_as(u8p)) != 0:
        return None
    return dst[:, :, 0] if c.value == 1 else dst


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Decode a JPEG byte string natively; None when out of scope.

    Returns HW (grayscale) or HW3 uint8, bit-identical to
    ``np.asarray(PIL.Image.open(...))`` (self-check-asserted — JPEG decode
    is only conventionally deterministic, see jpeg.cc). Scope: baseline/
    progressive gray+RGB; CMYK and exotic component counts return None.
    """
    lib = _load()
    if lib is None or not lib.tu_has_jpeg:
        return None
    return _decode_jpeg_raw(lib, data)


def _decode_jpeg_raw(lib: ctypes.CDLL, data: bytes) -> np.ndarray | None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    src = ctypes.cast(buf, u8p)
    if lib.tu_jpeg_probe(src, len(data), ctypes.byref(h), ctypes.byref(w),
                         ctypes.byref(c)) != 0:
        return None
    dst = np.empty((h.value, w.value, c.value), dtype=np.uint8)
    if lib.tu_jpeg_decode(src, len(data), dst.ctypes.data_as(u8p)) != 0:
        return None
    return dst[:, :, 0] if c.value == 1 else dst


def decode_gif(data: bytes) -> np.ndarray | None:
    """Decode a GIF byte string's first frame natively; None out of scope.

    Returns the HW uint8 palette INDEX band — exactly what
    ``np.asarray(PIL.Image.open(...))`` gives for a single-frame 'P' GIF
    (the Carvana mask format). Sub-canvas first frames (left/top ≠ 0 or
    size ≠ logical screen) return None for PIL compositing.
    """
    lib = _load()
    if lib is None:
        return None
    return _decode_gif_raw(lib, data)


def _decode_gif_raw(lib: ctypes.CDLL, data: bytes) -> np.ndarray | None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    src = ctypes.cast(buf, u8p)
    if lib.tu_gif_probe(src, len(data), ctypes.byref(h),
                        ctypes.byref(w)) != 0:
        return None
    dst = np.empty((h.value, w.value), dtype=np.uint8)
    if lib.tu_gif_decode(src, len(data), dst.ctypes.data_as(u8p)) != 0:
        return None
    return dst


_MODE_CHANNELS = {"L": 1, "P": 1, "LA": 2, "RGB": 3, "RGBA": 4}

# File formats the native tier can decode, keyed by PIL's reported format.
# JPEG additionally requires tu_has_jpeg (libjpeg linked at build time).
_FORMAT_DECODERS = {
    "PNG": _decode_png_raw,
    "JPEG": _decode_jpeg_raw,
    "GIF": _decode_gif_raw,
}


def asarray_fast(pil_img) -> np.ndarray:
    """``np.asarray(pil_img)``, decoding PNG/JPEG/GIF files natively when
    possible.

    The fast path triggers only for a lazy (not-yet-loaded) ``Image.open``
    of a supported file whose decoded shape matches the PIL-reported
    mode/size; every other case — including any decode failure — falls
    back to PIL's own decoder. Output is bit-identical either way
    (PNG/GIF are lossless; JPEG parity with Pillow's decoder is asserted
    by the runtime self-check before the path is enabled).
    """
    arr = _maybe_decode_file(pil_img)
    return np.asarray(pil_img) if arr is None else arr


def _maybe_decode_file(pil_img) -> np.ndarray | None:
    try:
        filename = getattr(pil_img, "filename", "")
        decoder = _FORMAT_DECODERS.get(getattr(pil_img, "format", None))
        if (
            not filename
            or decoder is None
            or pil_img.mode not in _MODE_CHANNELS
        ):
            return None
        # Skip if PIL already decoded (re-decoding would be wasted work).
        # Pillow ≥11 stores the core image in `_im` (`im` asserts when
        # lazy); older Pillow has a plain `im` attribute.
        loaded = (pil_img._im if hasattr(pil_img, "_im")
                  else pil_img.__dict__.get("im"))
        if loaded is not None:
            return None
        lib = _load()
        if lib is None:
            return None
        if decoder is _decode_jpeg_raw and not lib.tu_has_jpeg:
            return None
        arr = decoder(lib, Path(filename).read_bytes())
        if arr is None:
            return None
        channels = arr.shape[2] if arr.ndim == 3 else 1
        w, h = pil_img.size
        if arr.shape[:2] != (h, w) or channels != _MODE_CHANNELS[pil_img.mode]:
            return None  # file changed underfoot or probe/mode mismatch
        return arr
    except (OSError, ValueError):
        return None


def _self_check(lib: ctypes.CDLL) -> bool:
    """Bit-parity vs the installed Pillow on every loader-used combo."""
    try:
        from PIL import Image
    except ImportError:
        return False
    rng = np.random.default_rng(0)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for c in (1, 3):
        shape = (37, 53) if c == 1 else (37, 53, 3)
        src = rng.integers(0, 256, size=shape, dtype=np.uint8)
        pil = Image.fromarray(src)
        for pil_filter, native_filter in _PIL_TO_NATIVE.items():
            for new_w, new_h in ((21, 17), (96, 64), (53, 37)):
                want = np.asarray(pil.resize((new_w, new_h),
                                             resample=pil_filter))
                srcc = np.ascontiguousarray(src.reshape(37, 53, c))
                got = np.empty((new_h, new_w, c), dtype=np.uint8)
                rc = lib.tu_resize_u8(
                    srcc.ctypes.data_as(u8p), 37, 53, c,
                    got.ctypes.data_as(u8p), new_h, new_w, native_filter, 1,
                )
                if rc != 0:
                    return False
                if not np.array_equal(want.reshape(new_h, new_w, c), got):
                    return False
    return (_self_check_png(lib) and _self_check_gif(lib)
            and _self_check_jpeg(lib))


def _self_check_png(lib: ctypes.CDLL) -> bool:
    """PNG decode bit-parity vs Pillow for every loader-relevant mode."""
    import io

    from PIL import Image

    rng = np.random.default_rng(1)
    for mode, shape in (("L", (23, 31)), ("RGB", (23, 31, 3)),
                        ("RGBA", (23, 31, 4)), ("LA", (23, 31, 2))):
        src = rng.integers(0, 256, size=shape, dtype=np.uint8)
        bio = io.BytesIO()
        Image.fromarray(src, mode=mode).save(bio, format="PNG")
        want = np.asarray(Image.open(bio))
        got = _decode_png_raw(lib, bio.getvalue())
        if got is None or not np.array_equal(want, got):
            return False
    # Palette: the decoder must emit the raw index band, like np.asarray.
    idx = rng.integers(0, 5, size=(19, 27), dtype=np.uint8)
    pimg = Image.fromarray(idx).convert("P")
    bio = io.BytesIO()
    pimg.save(bio, format="PNG")
    want = np.asarray(Image.open(bio))
    got = _decode_png_raw(lib, bio.getvalue())
    if got is None or not np.array_equal(want, got):
        return False
    # Out-of-scope inputs must decline, not misdecode.
    if _decode_png_raw(lib, b"not a png at all") is not None:
        return False
    return True


def _self_check_jpeg(lib: ctypes.CDLL) -> bool:
    """JPEG decode bit-parity vs Pillow.

    JPEG decode is only conventionally deterministic (the spec tolerates
    IDCT variation); Pillow's bundled libjpeg-turbo and the system libjpeg
    both default to islow + fancy upsampling, but this check is the actual
    gate: every (mode, quality, chroma subsampling, progressive) combo the
    loader could meet must match bit-for-bit or JPEG stays on PIL.
    """
    if not lib.tu_has_jpeg:
        return True  # no-libjpeg build: the JPEG path already declines
    import io

    from PIL import Image

    rng = np.random.default_rng(2)
    for mode, shape in (("L", (9, 11)), ("RGB", (9, 11, 3))):
        # Low-frequency content (upscaled noise) — the JPEG-typical regime;
        # pure per-pixel noise would also pass but exercises less of the
        # upsampling path.
        base = rng.integers(0, 256, size=shape, dtype=np.uint8)
        img = Image.fromarray(base, mode=mode).resize((88, 72),
                                                      Image.BICUBIC)
        for quality in (75, 95):
            for subsampling in (0, 2):
                for progressive in (False, True):
                    bio = io.BytesIO()
                    img.save(bio, format="JPEG", quality=quality,
                             subsampling=subsampling,
                             progressive=progressive)
                    want = np.asarray(Image.open(bio))
                    got = _decode_jpeg_raw(lib, bio.getvalue())
                    if got is None or not np.array_equal(want, got):
                        return False
    if _decode_jpeg_raw(lib, b"definitely not a jpeg") is not None:
        return False
    return True


def _self_check_gif(lib: ctypes.CDLL) -> bool:
    """GIF first-frame index-band bit-parity vs Pillow (the Carvana mask
    format: single-frame palette GIFs; lossless, so parity is exact)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(3)
    # Binary mask-like, small-palette, and full-range index bands.
    for hi in (2, 5, 256):
        idx = rng.integers(0, hi, size=(23, 31), dtype=np.uint8)
        pimg = Image.fromarray(idx, mode="P")
        bio = io.BytesIO()
        pimg.save(bio, format="GIF")
        want = np.asarray(Image.open(bio))
        got = _decode_gif_raw(lib, bio.getvalue())
        if got is None or not np.array_equal(want, got):
            return False
    if _decode_gif_raw(lib, b"GIF89a but corrupt") is not None:
        return False
    return True


def available() -> bool:
    """True iff the library is built, loaded and bit-parity-verified."""
    return _load() is not None


def set_enabled(enabled: bool) -> None:
    """Force-enable/disable at runtime (tests, --no-native-preproc)."""
    global _state, _lib
    with _lock:
        if not enabled:
            _state = "disabled"
            _lib = None
        elif _state == "disabled":
            _state = "unknown"  # re-probe on next use


def pil_resize_native(pil_img, new_w: int, new_h: int, pil_filter: int,
                      n_threads: int | None = None):
    """Drop-in for `np.asarray(pil_img.resize((w, h), resample=f))`.

    Returns None when the native path can't serve this image (non-uint8
    mode, unsupported filter, library unavailable) — caller falls back to
    PIL. Palette ('P') images resize their index band under NEAREST exactly
    like PIL does, so they are served natively too.
    """
    native_filter = _PIL_TO_NATIVE.get(pil_filter)
    if native_filter is None:
        return None
    if pil_img.mode not in ("L", "P", "RGB", "RGBA"):
        return None
    if pil_img.mode == "P" and native_filter != NEAREST:
        return None  # PIL converts P under conv filters; don't reproduce
    if not available():
        return None
    arr = _maybe_decode_file(pil_img)  # native PNG decode when possible
    if arr is None:
        arr = np.asarray(pil_img)
    if arr.dtype != np.uint8:
        return None
    return resize_u8(arr, new_h, new_w, native_filter, n_threads=n_threads)
