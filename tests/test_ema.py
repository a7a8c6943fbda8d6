"""EMA shadow weights (--ema-decay): beyond-reference convenience — the
standard production trick for segmentation quality; no reference
counterpart."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.train import train_model


@pytest.fixture(scope="module")
def carvana(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_carvana(root, n=10, h=48, w=64)
    return root


def test_ema_e2e_and_resume(carvana, tmp_path):
    """Train with EMA → sibling _ema.npz lands, loads like any checkpoint,
    differs from the raw weights; --resume continues the average from it."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0,
                        num_workers=0)
    ckpts = tmp_path / "ckpts"

    params, state, hist = train_model(
        params, state, config,
        # batch 1 ⇒ division_step = 8//5 = 1: the EMA validation branch
        # actually runs (and appends to history) every step.
        dataset=ds, epochs=1, batch_size=1, learning_rate=1e-3,
        val_percent=0.2, checkpoint_dir=ckpts, seed=0, ema_decay=0.9,
    )
    raw = ckpts / "checkpoint_epoch1.npz"
    ema = ckpts / "checkpoint_epoch1_ema.npz"
    assert raw.exists() and ema.exists()
    assert len(hist["val_dice_ema"]) == len(hist["val_dice"]) > 0
    assert all(0.0 <= v <= 1.0 for v in hist["val_dice_ema"])

    from tpu_unet.checkpoint import load_checkpoint, read_checkpoint_meta

    _, extra = read_checkpoint_meta(ema)
    assert extra["ema_decay"] == 0.9
    pr, sr = init_unet(jax.random.PRNGKey(1), config)
    p_raw, _, _, _ = load_checkpoint(raw, pr, sr)
    pe, se = init_unet(jax.random.PRNGKey(2), config)
    p_ema, _, mv, _ = load_checkpoint(ema, pe, se)
    assert mv == [0, 255]
    # EMA is a trailing average — it must NOT equal the final raw weights.
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(p_raw), jax.tree.leaves(p_ema))]
    assert max(diffs) > 1e-6

    # Resume: continues from the sibling (log-checked via behavior — the
    # run must complete and write epoch 2's pair).
    params2, state2, _ = train_model(
        p_raw, sr, config,
        dataset=ds, epochs=2, batch_size=2, learning_rate=1e-3,
        val_percent=0.2, checkpoint_dir=ckpts, seed=0, ema_decay=0.9,
        resume=str(raw),
    )
    assert (ckpts / "checkpoint_epoch2_ema.npz").exists()


def test_ema_math_matches_closed_form(carvana, tmp_path):
    """One epoch, decay d: ema = d^K·w0 + (1−d)·Σ d^(K−k)·w_k — verified by
    replaying the saved raw trajectory is impractical, so instead verify
    against an independent host-side recomputation driven by the same
    step sequence (batch_size = n_train ⇒ one step: ema must equal
    d·w0 + (1−d)·w1)."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    w0 = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0,
                        num_workers=0)
    ckpts = tmp_path / "ckpts"
    d = 0.5
    p1, _, _ = train_model(
        params, state, config,
        dataset=ds, epochs=1, batch_size=8, learning_rate=1e-3,
        val_percent=0.2, checkpoint_dir=ckpts, seed=0, ema_decay=d,
    )
    from tpu_unet.checkpoint import load_checkpoint

    pe, se = init_unet(jax.random.PRNGKey(2), config)
    p_ema, _, _, _ = load_checkpoint(ckpts / "checkpoint_epoch1_ema.npz", pe, se)
    want = jax.tree.map(
        lambda a, b: d * a + (1 - d) * np.asarray(b), w0, p1)
    for a, b in zip(jax.tree.leaves(p_ema), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_ema_decay_validated():
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="ema-decay"):
        train_model(params, state, config, dataset=[], epochs=1,
                    batch_size=1, ema_decay=1.5)


def test_ema_horizon_warning(carvana, tmp_path, caplog):
    """A decay whose horizon exceeds the run (d^T > 0.1 of the init
    surviving) warns; a matched decay does not (BENCH_NOTES r3 foot-gun)."""
    import logging

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0,
                        num_workers=0)

    def run(decay):
        params, state = init_unet(jax.random.PRNGKey(0), config)
        with caplog.at_level(logging.WARNING, logger="tpu_unet.train_ema"):
            caplog.clear()
            train_model(params, state, config, dataset=ds, epochs=1,
                        batch_size=2, learning_rate=1e-3, val_percent=0.2,
                        save_checkpoint_flag=False,
                        checkpoint_dir=tmp_path, seed=0, ema_decay=decay)
        return [r for r in caplog.records if "INITIAL weights" in r.message]

    assert run(0.9999)   # 4 steps, 0.9999^4 ≈ 1.0 → warns
    assert not run(0.5)  # 0.5^4 ≈ 0.06 < 0.1 → silent


def test_ema_resume_of_completed_run_is_noop(carvana, tmp_path):
    """Resuming a finished run with --ema-decay must be a graceful no-op
    (the horizon warning's suggested-decay expression divides by the step
    count, which is zero here — code-review r3 finding)."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0,
                        num_workers=0)
    train_model(params, state, config, dataset=ds, epochs=1, batch_size=2,
                learning_rate=1e-3, val_percent=0.2, save_optimizer=True,
                checkpoint_dir=tmp_path, seed=0, ema_decay=0.99)
    p2, s2 = init_unet(jax.random.PRNGKey(0), config)
    # epochs == resumed epoch -> zero steps to run.
    train_model(p2, s2, config, dataset=ds, epochs=1, batch_size=2,
                learning_rate=1e-3, val_percent=0.2,
                resume=str(tmp_path / "checkpoint_epoch1.npz"),
                checkpoint_dir=tmp_path, seed=0, ema_decay=0.99)
