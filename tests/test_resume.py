"""Full-state resume: optimizer + epoch continue exactly (beyond-reference;
the reference's --load restores weights only and restarts at epoch 1)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.checkpoint import load_checkpoint, save_checkpoint
from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.optim import rmsprop_init
from tpu_unet.train import train_model


def test_opt_state_roundtrip(tmp_path):
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    opt = jax.tree.map(lambda a: a + 1.5, opt)  # non-trivial state
    p = tmp_path / "c.npz"
    save_checkpoint(p, params, state, mask_values=[0, 255],
                    extra={"epoch": 3, "lr": 2e-4}, opt_state=opt)

    p2, s2 = init_unet(jax.random.PRNGKey(1), config)
    o2 = rmsprop_init(p2)
    _, _, mv, extra = load_checkpoint(p, p2, s2, o2)
    assert mv == [0, 255]
    assert extra["epoch"] == 3
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(extra["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_epochs(tmp_path):
    make_synthetic_carvana(tmp_path / "d", n=6, h=32, w=32)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)

    ck = tmp_path / "ck"
    train_model(params, state, config, dataset=ds, epochs=1, batch_size=2,
                learning_rate=1e-3, val_percent=0.2, checkpoint_dir=ck,
                save_optimizer=True, seed=0)
    assert (ck / "checkpoint_epoch1.npz").exists()

    # Resume for epoch 2 only: history must contain exactly epoch-2 steps.
    params2, state2 = init_unet(jax.random.PRNGKey(0), config)
    _, _, hist = train_model(
        params2, state2, config, dataset=ds, epochs=2, batch_size=2,
        learning_rate=1e-3, val_percent=0.2, checkpoint_dir=ck,
        save_optimizer=True, resume=str(ck / "checkpoint_epoch1.npz"), seed=0,
    )
    # 6 imgs, val 20% → 1 val / 5 train → ceil(5/2)=3 steps for the ONE
    # resumed epoch (epoch 1 is skipped).
    assert len(hist["train_loss"]) == 3
    assert (ck / "checkpoint_epoch2.npz").exists()


def test_checkpoint_carries_scheduler_state(tmp_path):
    """Checkpoints persist the FULL plateau state, not just the lr, so resume
    keeps best/num_bad_epochs/cooldown progress (ADVICE r1)."""
    make_synthetic_carvana(tmp_path / "d", n=6, h=32, w=32)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ck = tmp_path / "ck"
    train_model(params, state, config, dataset=ds, epochs=1, batch_size=2,
                learning_rate=1e-3, val_percent=0.2, checkpoint_dir=ck, seed=0)

    from tpu_unet.checkpoint import read_checkpoint_meta

    _, extra = read_checkpoint_meta(ck / "checkpoint_epoch1.npz")
    sd = extra["scheduler"]
    # "name" self-describes the schedule (the --lr-scheduler menu) so resume
    # can detect a schedule switch; the rest is the full plateau state.
    assert set(sd) == {"name", "lr", "best", "num_bad_epochs", "cooldown_counter"}
    assert sd["name"] == "plateau"


def test_plateau_load_state_dict_resumes_progress():
    """A restored scheduler must keep counting bad epochs where it left off."""
    import pytest

    from tpu_unet.optim import ReduceLROnPlateau

    s1 = ReduceLROnPlateau(lr=1e-3, mode="max", patience=2)
    for m in (0.5, 0.4, 0.4):
        s1.step(m)  # best=0.5, then 2 bad epochs
    s2 = ReduceLROnPlateau(lr=1e-3, mode="max", patience=2)
    s2.load_state_dict(s1.state_dict())
    assert s2.step(0.4) == pytest.approx(1e-4)  # 3rd bad epoch -> lr drop
