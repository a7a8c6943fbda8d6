"""jax.export deployment artifacts: serialize → deserialize → call parity,
symbolic batch dimension, and the export CLI round-trip (--check)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.export import export_infer, load_exported, save_exported
from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.models.infer import fold_bn, unet_infer_apply


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
