"""Preemption-safe training: SIGTERM/SIGINT → resumable INTERRUPTED.npz.

The legacy reference saved INTERRUPTED.pth on KeyboardInterrupt (reference:
legacy train.py __main__, UNVERIFIED mount — SURVEY.md §A.1 contingency
class); production TPU pods are preempted with SIGTERM + a grace period.
Either signal must stop training at the next safe boundary with a
FULL-state checkpoint (params+BN+optimizer+scheduler+epoch) that --resume
can continue from, and the previous signal handlers must be restored.
"""

import os
import signal

import numpy as np
import pytest

import jax

import tpu_unet.train as train_mod
from tpu_unet.checkpoint import read_checkpoint_meta
from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
from tpu_unet.models import UNetConfig, init_unet

# Fast-tier exclusion (VERDICT r3 next #3): signal-driven training interruption end-to-end.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def carvana(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_carvana(root, n=10, h=48, w=64)
    return root


@pytest.fixture
def small(carvana):
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0,
                        num_workers=0)
    return config, params, state, ds


@pytest.mark.parametrize("signum", [signal.SIGTERM, signal.SIGINT])
def test_signal_saves_resumable_checkpoint(small, tmp_path, monkeypatch,
                                           signum):
    config, params, state, ds = small
    # Deterministic trigger: deliver the signal during the FIRST validation
    # (n_train=8, b=1 → division_step=1 → validation after step 1); the
    # loop must then stop at the next batch boundary.
    real_eval = train_mod.evaluate
    calls = {"n": 0}

    def eval_and_kill(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            os.kill(os.getpid(), signum)
        return real_eval(*a, **k)

    monkeypatch.setattr(train_mod, "evaluate", eval_and_kill)
    prev = signal.getsignal(signum)
    p2, s2, hist = train_mod.train_model(
        params, state, config, dataset=ds, epochs=2, batch_size=1,
        learning_rate=1e-3, val_percent=0.2,
        checkpoint_dir=tmp_path / "ck", seed=0,
    )
    assert signal.getsignal(signum) is prev, "handler not restored"
    ipath = tmp_path / "ck" / "INTERRUPTED.npz"
    assert ipath.exists()
    assert len(hist["train_loss"]) < 16, "did not stop early"

    _, extra = read_checkpoint_meta(ipath)
    assert bool(extra.get("interrupted", False))
    assert int(extra["epoch"]) == 0  # epoch 1 was incomplete
    assert int(extra["step"]) >= 1


def test_resume_from_interrupted(small, tmp_path, monkeypatch):
    config, params, state, ds = small
    real_eval = train_mod.evaluate
    calls = {"n": 0}

    def eval_and_kill(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            os.kill(os.getpid(), signal.SIGTERM)
        return real_eval(*a, **k)

    monkeypatch.setattr(train_mod, "evaluate", eval_and_kill)
    train_mod.train_model(
        params, state, config, dataset=ds, epochs=2, batch_size=1,
        learning_rate=1e-3, val_percent=0.2,
        checkpoint_dir=tmp_path / "ck", seed=0,
    )
    ipath = tmp_path / "ck" / "INTERRUPTED.npz"
    assert ipath.exists()

    # Resume re-runs the interrupted epoch from its start and completes.
    monkeypatch.setattr(train_mod, "evaluate", real_eval)
    p0, s0 = init_unet(jax.random.PRNGKey(1), config)
    _, _, hist = train_mod.train_model(
        p0, s0, config, dataset=ds, epochs=2, batch_size=1,
        learning_rate=1e-3, val_percent=0.2,
        checkpoint_dir=tmp_path / "ck", seed=0, resume=str(ipath),
    )
    assert len(hist["train_loss"]) == 16  # epochs 1..2, 8 steps each
    assert (tmp_path / "ck" / "checkpoint_epoch2.npz").exists()
    assert np.all(np.isfinite(hist["train_loss"]))


def test_second_sigint_aborts_immediately(small, tmp_path, monkeypatch):
    config, params, state, ds = small
    real_eval = train_mod.evaluate
    calls = {"n": 0}

    def eval_and_double_kill(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            os.kill(os.getpid(), signal.SIGINT)  # sets the stop flag
            os.kill(os.getpid(), signal.SIGINT)  # second: abort NOW
        return real_eval(*a, **k)

    monkeypatch.setattr(train_mod, "evaluate", eval_and_double_kill)
    prev = signal.getsignal(signal.SIGINT)
    with pytest.raises(KeyboardInterrupt):
        train_mod.train_model(
            params, state, config, dataset=ds, epochs=2, batch_size=1,
            learning_rate=1e-3, val_percent=0.2,
            checkpoint_dir=tmp_path / "ck", seed=0,
        )
    assert signal.getsignal(signal.SIGINT) is prev, "handler not restored"


def test_no_signal_no_interrupt_file(small, tmp_path):
    """A clean run never writes INTERRUPTED.npz."""
    config, params, state, ds = small
    train_mod.train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=2,
        learning_rate=1e-3, val_percent=0.2,
        checkpoint_dir=tmp_path / "ck", seed=0,
    )
    assert not (tmp_path / "ck" / "INTERRUPTED.npz").exists()
    assert (tmp_path / "ck" / "checkpoint_epoch1.npz").exists()
