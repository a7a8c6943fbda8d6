"""Ahead-of-time model export: serialized StableHLO deployment artifacts.

The reference deploys by shipping the Python model class plus a ``.pth``
(torch.hub / predict.py; SURVEY.md §2 #17–20). The TPU-native deployment
story is ahead-of-time compilation: ``jax.export`` lowers the BN-folded
inference forward to StableHLO once, weights baked in as constants, and the
serialized artifact runs in any JAX process — no model code, no checkpoint
loading, no Python class versioning at the serving site. This is the
artifact a production fleet loads.

Design choices:
  * The XLA backend only (no Pallas custom-calls inside the artifact), so
    one artifact is portable across platforms; by default it is lowered for
    BOTH 'tpu' and 'cpu' (multi-platform export) so the same file serves on
    a TPU pod and on a CPU canary.
  * Batch is a SYMBOLIC dimension by default (jax.export symbolic shapes):
    the serving site calls with any batch size without re-export; H×W stay
    static (XLA wants static spatial tiling on TPU — variable image sizes
    are the tiler's job, parallel/tiling.py).
  * Weights are baked into the artifact as constants: self-contained file,
    one ``load`` → ``call``.

CLI:
  python -m tpu_unet.export -m ckpt.npz -o model.jaxexp --height 320 --width 480
  python -m tpu_unet.export -m ckpt.npz -o model.jaxexp ... --check  # round-trip
  python -m tpu_unet.export -m ckpt.npz -o model.savedmodel --height ... # TF Serving
  python -m tpu_unet.export -m ckpt.npz -o model.pth                # torch sites
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.models.infer import fold_bn, unet_infer_apply

logger = logging.getLogger(__name__)

DEFAULT_PLATFORMS = ("tpu", "cpu")


def export_infer(
    params,
    state,
    config: UNetConfig,
    *,
    height: int,
    width: int,
    batch: int | None = None,
    amp: bool = True,
    platforms=DEFAULT_PLATFORMS,
    tta: bool = False,
    tta_mode: str = "flips",
):
    """Export the BN-folded eval forward as a jax.export.Exported.

    ``batch=None`` exports a symbolic batch dimension (call with any batch);
    an int pins it. Returns the Exported; weights are baked in, so the
    caller invokes ``exported.call(x)`` with just the image batch
    [N, height, width, n_channels] float32 and gets fp32 logits
    [N, height, width, n_classes].

    ``tta`` bakes the flip ensemble INTO the program (the four views as
    batch rows of one forward, merged logits out) — the right place for it
    in the artifact story: serving-site TTA flags can't apply to a
    pre-compiled program, so the ensemble ships inside it, and the
    artifact's call contract is unchanged.
    """
    folded = fold_bn(params, state, config)
    compute_dtype = jnp.bfloat16 if amp else None

    def fn(x):
        def forward(v):
            return unet_infer_apply(
                folded, v, config=config, backend="xla",
                compute_dtype=compute_dtype,
            )

        if not tta:
            return forward(x)
        from tpu_unet.models.tta import tta_merge, tta_views

        return tta_merge(forward(tta_views(x, tta_mode)), x.shape[0], tta_mode)

    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = batch
    xspec = jax.ShapeDtypeStruct((b, height, width, config.n_channels), jnp.float32)
    return jax.export.export(jax.jit(fn), platforms=list(platforms))(xspec)


def export_savedmodel(
    params,
    state,
    config: UNetConfig,
    *,
    path: str | Path,
    height: int,
    width: int,
    batch: int | None = None,
    amp: bool = True,
    tta: bool = False,
    tta_mode: str = "flips",
    platforms=DEFAULT_PLATFORMS,
    meta: dict | None = None,
) -> None:
    """Export the BN-folded eval forward as a TensorFlow SavedModel.

    Interop with the OTHER serving ecosystem: jax2tf (native serialization)
    wraps the exact StableHLO program ``export_infer`` produces in a
    ``XlaCallModule`` op inside an ordinary SavedModel, so TF Serving /
    tf.saved_model sites run the model with zero JAX at the serving site —
    the TF analog of the reference shipping a .pth for torch sites
    (reference: hubconf.py distribution story, UNVERIFIED mount,
    SURVEY.md §2 #20). Batch stays symbolic (``None`` in the signature)
    unless pinned; weights are baked in as constants.

    The ``mask_values``/config sidecar (serve.py's rendering contract) is
    written INSIDE the SavedModel directory as ``tpu_unet_meta.json`` —
    SavedModel loaders ignore unknown files, so the directory stays a valid
    artifact for both consumers.
    """
    import tensorflow as tf  # lazy: ~20 s import, only this path needs it
    from jax.experimental import jax2tf

    folded = fold_bn(params, state, config)
    compute_dtype = jnp.bfloat16 if amp else None

    def fn(x):
        def forward(v):
            return unet_infer_apply(
                folded, v, config=config, backend="xla",
                compute_dtype=compute_dtype,
            )

        if not tta:
            return forward(x)
        from tpu_unet.models.tta import tta_merge, tta_views

        return tta_merge(forward(tta_views(x, tta_mode)), x.shape[0], tta_mode)

    poly = None if batch is not None else "(b, _, _, _)"
    # Explicit multi-platform lowering: a bare-CLI export runs with the TPU
    # backend, and without this the embedded StableHLO would be TPU-only —
    # unloadable on the TF-CPU serving sites SavedModel mostly targets.
    tf_fn = jax2tf.convert(
        fn,
        polymorphic_shapes=[poly] if poly else None,
        native_serialization_platforms=list(platforms),
    )
    module = tf.Module()
    sig_batch = batch  # None -> dynamic batch in the TF signature
    module.serve = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[tf.TensorSpec(
            [sig_batch, height, width, config.n_channels], tf.float32,
            name="image",
        )],
    )
    tf.saved_model.save(
        module, str(path),
        signatures={"serving_default": module.serve},
    )
    if meta is not None:
        (Path(path) / "tpu_unet_meta.json").write_text(json.dumps(meta))


def save_exported(exported, path: str | Path, meta: dict | None = None) -> None:
    """Write the serialized artifact, plus a ``<path>.meta.json`` sidecar.

    The sidecar carries what the StableHLO program cannot: the checkpoint's
    ``mask_values`` palette (the load-bearing rendering contract predict.py
    preserves — without it an artifact-served multiclass mask would render
    as near-black class indices) and the model config, so a serving site
    reconstructs the full predict_img semantics from the artifact alone."""
    Path(path).write_bytes(exported.serialize())
    if meta is not None:
        Path(str(path) + ".meta.json").write_text(json.dumps(meta))


def load_exported(path: str | Path):
    """Deserialize an artifact; returns the Exported (use ``.call(x)``)."""
    return jax.export.deserialize(Path(path).read_bytes())


def load_artifact_meta(path: str | Path) -> dict:
    """Read the ``<path>.meta.json`` sidecar ({} for pre-sidecar artifacts)."""
    p = Path(str(path) + ".meta.json")
    if not p.exists():
        return {}
    return json.loads(p.read_text())


def _load_model(model_path: str, args):
    """Checkpoint loading with self-describing config (predict.py parity)."""
    from tpu_unet.checkpoint import import_pth, load_checkpoint, read_checkpoint_meta

    config = UNetConfig(
        n_channels=3, n_classes=args.classes, bilinear=args.bilinear
    )
    if str(model_path).endswith(".pth"):
        params, state, mask_values = import_pth(model_path, config)
        return params, state, config, mask_values
    _, extra = read_checkpoint_meta(model_path)
    if "config" in extra:
        config = UNetConfig(**extra["config"])
    params, state = init_unet(jax.random.PRNGKey(0), config)
    params, state, mask_values, _ = load_checkpoint(model_path, params, state)
    return params, state, config, mask_values


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Export the model as a serialized StableHLO artifact")
    p.add_argument("--model", "-m", required=True, help="Checkpoint (.npz or .pth)")
    p.add_argument("--output", "-o", required=True,
                   help="Output artifact path: .jaxexp (StableHLO), "
                        ".savedmodel (TF Serving), or .pth (torch interop)")
    p.add_argument("--height", type=int, default=None,
                   help="Static input height (required for .jaxexp output)")
    p.add_argument("--width", type=int, default=None,
                   help="Static input width (required for .jaxexp output)")
    p.add_argument("--batch", type=int, default=None,
                   help="Pin the batch dim (default: symbolic, any batch)")
    p.add_argument("--no-amp", dest="amp", action="store_false", default=True,
                   help="Compute in fp32 instead of bf16")
    p.add_argument("--platforms", type=str, default=",".join(DEFAULT_PLATFORMS),
                   help="Comma-separated lowering platforms")
    p.add_argument("--tta", action="store_true", default=False,
                   help="Bake the flip-view ensemble into the artifact "
                        "(serve --tta can't apply to a pre-compiled program)")
    p.add_argument("--tta-mode", choices=["flips", "hflip"], default="flips",
                   help="TTA view set to bake: all four flips, or identity+"
                        "left-right only")
    p.add_argument("--check", action="store_true", default=False,
                   help="Round-trip the artifact and verify vs the live model")
    p.add_argument("--classes", "-c", type=int, default=1)
    p.add_argument("--bilinear", action="store_true", default=False)
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    args = get_args(argv)
    params, state, config, mask_values = _load_model(args.model, args)
    if str(args.output).endswith(".pth"):
        # torch interop, the other direction: write a state_dict the
        # reference loads directly (checkpoint.export_pth).
        from tpu_unet.checkpoint import export_pth, import_pth

        export_pth(args.output, params, state,
                   bilinear=config.bilinear, mask_values=mask_values)
        logger.info("Exported %s -> %s (torch state_dict, %.1f MB)",
                    args.model, args.output,
                    Path(args.output).stat().st_size / 1e6)
        if args.check:
            p2, s2, mv2 = import_pth(args.output, config)
            for a, b in zip(jax.tree.leaves((params, state)),
                            jax.tree.leaves((p2, s2))):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert (mask_values is None or
                    [int(v) for v in mv2] == [int(v) for v in mask_values])
            logger.info("Round-trip check OK (bitwise)")
        return
    if args.height is None or args.width is None:
        raise SystemExit("--height/--width are required for .jaxexp/"
                         ".savedmodel export")
    if str(args.output).endswith(".savedmodel"):
        # TF Serving interop: the same StableHLO program inside a SavedModel.
        export_savedmodel(
            params, state, config,
            path=args.output, height=args.height, width=args.width,
            batch=args.batch, amp=args.amp, tta=args.tta,
            tta_mode=args.tta_mode,
            platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
            meta={"mask_values": mask_values, "config": config._asdict(),
                  "tta": args.tta, "tta_mode": args.tta_mode},
        )
        logger.info("Exported %s -> %s (TF SavedModel, batch=%s, %dx%d)",
                    args.model, args.output, args.batch or "dynamic",
                    args.height, args.width)
        if args.check:
            import tensorflow as tf

            loaded = tf.saved_model.load(args.output)
            rng = np.random.default_rng(0)
            x = rng.random((args.batch or 2, args.height, args.width,
                            config.n_channels), dtype=np.float32)
            got = np.asarray(loaded.serve(tf.constant(x)))
            folded = fold_bn(params, state, config)

            def live(v):
                return unet_infer_apply(
                    folded, v, config=config, backend="xla",
                    compute_dtype=jnp.bfloat16 if args.amp else None,
                )

            # TF executes the embedded StableHLO on its XLA *CPU* backend;
            # a bare-CLI live forward would run on the TPU, and bf16
            # accumulation order differs across platforms far beyond any
            # honest logit tolerance. Compare same-platform: run the live
            # reference on JAX's CPU backend (always registered alongside
            # the TPU plugin).
            with jax.default_device(jax.devices("cpu")[0]):
                if args.tta:
                    from tpu_unet.models.tta import tta_merge, tta_views

                    want = np.asarray(tta_merge(
                        live(tta_views(jnp.asarray(x), args.tta_mode)),
                        x.shape[0], args.tta_mode))
                else:
                    want = np.asarray(live(jnp.asarray(x)))
            # Same platform but different XLA builds (TF's vs JAX's): allow
            # fusion-order slack, wider under bf16.
            tol = (dict(rtol=2e-2, atol=1e-2) if args.amp
                   else dict(rtol=1e-4, atol=1e-5))
            np.testing.assert_allclose(got, want, **tol)
            logger.info("Round-trip check OK (max rel Δ = %.2e)",
                        (np.abs(got - want) /
                         np.maximum(np.abs(want), 1e-6)).max())
        return
    exported = export_infer(
        params, state, config,
        height=args.height, width=args.width, batch=args.batch, amp=args.amp,
        platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
        tta=args.tta, tta_mode=args.tta_mode,
    )
    save_exported(exported, args.output,
                  meta={"mask_values": mask_values, "config": config._asdict(),
                        "tta": args.tta,
                        "tta_mode": args.tta_mode})
    size_mb = Path(args.output).stat().st_size / 1e6
    logger.info(
        "Exported %s -> %s (%.1f MB, platforms=%s, batch=%s, %dx%d)",
        args.model, args.output, size_mb, exported.platforms,
        args.batch or "symbolic", args.height, args.width,
    )
    if args.check:
        reloaded = load_exported(args.output)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.random((args.batch or 2, args.height, args.width, config.n_channels),
                       dtype=np.float32)
        )
        got = np.asarray(reloaded.call(x))
        folded = fold_bn(params, state, config)

        def live(v):
            return unet_infer_apply(
                folded, v, config=config, backend="xla",
                compute_dtype=jnp.bfloat16 if args.amp else None,
            )

        if args.tta:
            from tpu_unet.models.tta import tta_merge, tta_views

            want = np.asarray(tta_merge(live(tta_views(x, args.tta_mode)),
                                        x.shape[0], args.tta_mode))
        else:
            want = np.asarray(live(x))
        np.testing.assert_allclose(got, want, atol=1e-5)
        logger.info("Round-trip check OK (max |Δ| = %.2e)", np.abs(got - want).max())


if __name__ == "__main__":
    main()
