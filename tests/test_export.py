"""jax.export deployment artifacts: serialize → deserialize → call parity,
symbolic batch dimension, and the export CLI round-trip (--check)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.export import export_infer, load_exported, save_exported
from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.models.infer import fold_bn, unet_infer_apply
import pytest

# Fast-tier exclusion (VERDICT r3 next #3): imports TensorFlow; StableHLO/SavedModel round-trips.
pytestmark = pytest.mark.slow


def test_export_roundtrip_symbolic_batch(tmp_path):
    config = UNetConfig(3, 2, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    exported = export_infer(
        params, state, config, height=48, width=64, amp=False,
        platforms=("cpu",),  # test env compiles/verifies on the CPU mesh
    )
    path = tmp_path / "model.jaxexp"
    save_exported(exported, path)
    assert path.stat().st_size > 0

    reloaded = load_exported(path)
    folded = fold_bn(params, state, config)
    rng = np.random.default_rng(0)
    # Symbolic batch: one artifact serves any batch size without re-export.
    for batch in (1, 3):
        x = jnp.asarray(rng.random((batch, 48, 64, 3), dtype=np.float32))
        got = np.asarray(reloaded.call(x))
        want = np.asarray(
            unet_infer_apply(folded, x, config=config, backend="xla")
        )
        assert got.shape == (batch, 48, 64, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_cli_check(tmp_path):
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.export import main

    config = UNetConfig(3, 1, bilinear=False, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(1), config)
    ckpt = tmp_path / "m.npz"
    save_checkpoint(
        ckpt, params, state,
        extra={"config": {
            "n_channels": 3, "n_classes": 1, "bilinear": False,
            "base_channels": 8,
        }},
    )
    out = tmp_path / "m.jaxexp"
    main([
        "-m", str(ckpt), "-o", str(out), "--height", "48", "--width", "48",
        "--batch", "2", "--no-amp", "--platforms", "cpu", "--check",
    ])
    assert out.stat().st_size > 0


def test_export_tta_artifact(tmp_path):
    """--tta export bakes the flip ensemble into the program: the artifact's
    output equals the manual four-view ensemble of the folded forward, with
    a symbolic batch, and the sidecar records the mode."""
    from tpu_unet.export import (
        export_infer, load_artifact_meta, load_exported, save_exported,
    )
    from tpu_unet.models.infer import fold_bn, unet_infer_apply
    from tpu_unet.models.tta import tta_merge, tta_views

    config = UNetConfig(3, 1, bilinear=True, base_channels=4)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    exported = export_infer(params, state, config, height=32, width=48,
                            amp=False, platforms=("cpu",), tta=True)
    path = tmp_path / "m_tta.jaxexp"
    save_exported(exported, path, meta={"mask_values": [0, 255],
                                        "config": config._asdict(),
                                        "tta": True})
    assert load_artifact_meta(path)["tta"] is True

    reloaded = load_exported(path)
    rng = np.random.default_rng(0)
    for batch in (1, 3):  # symbolic batch: two different sizes, one program
        x = jnp.asarray(rng.random((batch, 32, 48, 3), dtype=np.float32))
        got = np.asarray(reloaded.call(x))
        folded = fold_bn(params, state, config)
        want = np.asarray(tta_merge(
            unet_infer_apply(folded, tta_views(x), config=config,
                             backend="xla"), batch))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_savedmodel_roundtrip(tmp_path):
    """TF Serving interop: export_savedmodel wraps the same StableHLO
    program in a SavedModel (jax2tf native serialization). Reloading with
    plain TensorFlow must reproduce the folded forward across two batch
    sizes (dynamic batch), and the mask_values/config sidecar rides inside
    the directory."""
    tf = __import__("pytest").importorskip("tensorflow")
    from tpu_unet.export import export_savedmodel

    config = UNetConfig(3, 2, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    path = tmp_path / "m.savedmodel"
    export_savedmodel(
        params, state, config, path=path, height=32, width=48, amp=False,
        meta={"mask_values": [0, 128, 255], "config": config._asdict()},
    )
    import json

    meta = json.loads((path / "tpu_unet_meta.json").read_text())
    assert meta["mask_values"] == [0, 128, 255]

    loaded = tf.saved_model.load(str(path))
    folded = fold_bn(params, state, config)
    rng = np.random.default_rng(0)
    for batch in (1, 3):  # dynamic batch: one artifact, any batch size
        x = rng.random((batch, 32, 48, 3), dtype=np.float32)
        got = np.asarray(loaded.serve(tf.constant(x)))
        want = np.asarray(
            unet_infer_apply(folded, jnp.asarray(x), config=config,
                             backend="xla")
        )
        assert got.shape == (batch, 32, 48, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)
