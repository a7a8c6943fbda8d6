"""End-to-end slice: train on synthetic Carvana, loss decreases, checkpoint
lands, predict produces a mask file (SURVEY.md §7 stage 3 milestone)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
from tpu_unet.evaluate import evaluate
from tpu_unet.models import UNetConfig, init_unet
from tpu_unet.predict import main as predict_main, mask_to_image, predict_img
from tpu_unet.train import compute_loss, main as train_main, make_train_step, train_model

# Fast-tier exclusion (VERDICT r3 next #3): train/predict CLI end-to-end drives (many full jit compiles + subprocess mains).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def carvana(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_carvana(root, n=10, h=48, w=64)
    return root


def test_train_loss_decreases(carvana, tmp_path):
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0, num_workers=0)

    params, state, hist = train_model(
        params, state, config,
        dataset=ds, epochs=2, batch_size=2, learning_rate=1e-3,
        val_percent=0.2, checkpoint_dir=tmp_path / "ckpts", seed=0,
    )
    losses = hist["train_loss"]
    assert len(losses) == 8  # 8 train imgs / batch 2 × 2 epochs
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    assert (tmp_path / "ckpts" / "checkpoint_epoch2.npz").exists()
    # Validation ran (division_step = 4//(5·2)=0 → none; evaluate manually).
    val_dice, val_iou = evaluate(
        params, state,
        [{"image": np.stack([ds[i]["image"] for i in (0, 1)]),
          "mask": np.stack([ds[i]["mask"] for i in (0, 1)])}],
        config,
    )
    assert 0.0 <= val_dice <= 1.0 and 0.0 <= val_iou <= 1.0


@pytest.mark.parametrize("optimizer", ["sgd", "adam", "adamw"])
def test_optimizer_menu_e2e(carvana, tmp_path, optimizer):
    """train_model drives every menu entry end-to-end: loss decreases, the
    checkpoint self-describes its optimizer, and full-state --resume
    round-trips through the non-RMSprop state structures."""
    from tpu_unet.checkpoint import read_checkpoint_meta

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0, num_workers=0)

    params, state, hist = train_model(
        params, state, config,
        dataset=ds, epochs=2, batch_size=2,
        learning_rate=1e-2 if optimizer == "sgd" else 1e-3,
        optimizer=optimizer, save_optimizer=True,
        val_percent=0.2, checkpoint_dir=tmp_path / "ckpts", seed=0,
    )
    losses = hist["train_loss"]
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    ckpt = tmp_path / "ckpts" / "checkpoint_epoch2.npz"
    _, extra = read_checkpoint_meta(ckpt)
    assert extra["optimizer"] == optimizer

    # Same-optimizer resume restores the saved state structure cleanly.
    p2, s2 = init_unet(jax.random.PRNGKey(1), config)
    _, _, hist2 = train_model(
        p2, s2, config, dataset=ds, epochs=3, batch_size=2,
        learning_rate=1e-3, optimizer=optimizer, resume=str(ckpt),
        val_percent=0.2, save_checkpoint_flag=False, seed=0,
    )
    assert len(hist2["train_loss"]) == 4  # epochs 1-2 already done


def test_optimizer_mismatch_resume_degrades_to_weights_only(carvana, tmp_path, caplog):
    """A checkpoint written under rmsprop resumed with --optimizer sgd must
    not crash on the opt/ key structure — it warns and drops the state."""
    import logging

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0, num_workers=0)
    params, state, _ = train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=2,
        learning_rate=1e-3, save_optimizer=True,
        val_percent=0.2, checkpoint_dir=tmp_path / "ck", seed=0,
    )
    ckpt = tmp_path / "ck" / "checkpoint_epoch1.npz"
    p2, s2 = init_unet(jax.random.PRNGKey(1), config)
    with caplog.at_level(logging.WARNING):
        _, _, hist = train_model(
            p2, s2, config, dataset=ds, epochs=2, batch_size=2,
            learning_rate=1e-2, optimizer="sgd", resume=str(ckpt),
            val_percent=0.2, save_checkpoint_flag=False, seed=0,
        )
    assert any("optimizer state (if any) is discarded" in r.getMessage()
               for r in caplog.records)
    assert np.all(np.isfinite(hist["train_loss"]))


def test_early_stopping_halts_run(carvana, tmp_path):
    """--early-stopping N: with lr=0 the val Dice never improves after the
    first validation, so N=1 stops at the second one — mid-epoch-1 of a
    3-epoch run, with exactly one (final) checkpoint written."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0, num_workers=0)

    _, _, hist = train_model(
        params, state, config,
        dataset=ds, epochs=3, batch_size=2, learning_rate=0.0,
        val_percent=0.2, val_per_epoch=4, early_stopping=1,
        checkpoint_dir=tmp_path / "ck", seed=0,
    )
    assert len(hist["val_dice"]) == 2  # first sets best, second stops
    assert (tmp_path / "ck" / "checkpoint_epoch1.npz").exists()
    assert not (tmp_path / "ck" / "checkpoint_epoch2.npz").exists()


def test_early_stopping_state_resumes(carvana, tmp_path):
    """The patience bookkeeping rides checkpoints: a run that banked one bad
    validation resumes with that counter, so --early-stopping 2 stops at the
    FIRST post-resume validation instead of restarting the count
    (code-review r3)."""
    import pytest

    from tpu_unet.checkpoint import read_checkpoint_meta

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0, num_workers=0)

    # lr=0: first validation sets best, every later one is "no improvement".
    common = dict(dataset=ds, batch_size=2, learning_rate=0.0,
                  val_percent=0.2, val_per_epoch=2, early_stopping=2, seed=0)
    params, state, h1 = train_model(
        params, state, config, epochs=1,
        checkpoint_dir=tmp_path / "ck", **common)
    ck = tmp_path / "ck" / "checkpoint_epoch1.npz"
    _, extra = read_checkpoint_meta(ck)
    assert extra["early_stop"]["bad"] == 1  # one bad validation banked

    p2, s2 = init_unet(jax.random.PRNGKey(1), config)
    _, _, h2 = train_model(
        p2, s2, config, epochs=3, resume=str(ck),
        save_checkpoint_flag=False, **common)
    # One more non-improving validation (the 2nd overall) stops the run.
    assert len(h2["val_dice"]) == 1

    with pytest.raises(ValueError, match="early-stopping"):
        train_model(p2, s2, config, epochs=1, save_checkpoint_flag=False,
                    dataset=ds, batch_size=2, learning_rate=0.0,
                    val_percent=0.2, early_stopping=0, seed=0)


def test_cosine_scheduler_e2e_and_resume(carvana, tmp_path):
    """--lr-scheduler cosine through train_model: the checkpoint carries the
    advanced schedule state (named, epoch-stepped), and --resume continues
    the curve instead of restarting it."""
    import math

    from tpu_unet.checkpoint import read_checkpoint_meta

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0, num_workers=0)

    base_lr = 1e-3
    params, state, _ = train_model(
        params, state, config,
        dataset=ds, epochs=2, batch_size=2, learning_rate=base_lr,
        lr_scheduler="cosine", val_percent=0.2,
        checkpoint_dir=tmp_path / "ck", seed=0,
    )
    _, extra = read_checkpoint_meta(tmp_path / "ck" / "checkpoint_epoch2.npz")
    sched = extra["scheduler"]
    assert sched["name"] == "cosine"
    assert sched["epoch"] == 2
    # T_max = epochs = 2 → after 2 epoch_end()s lr sits at the floor (0).
    expected = 0.5 * base_lr * (1 + math.cos(math.pi * 2 / 2))
    assert abs(sched["lr"] - expected) < 1e-12

    # Resume for one more epoch: the curve continues (epoch counter 3),
    # not a fresh schedule.
    p2, s2 = init_unet(jax.random.PRNGKey(1), config)
    _, _, hist = train_model(
        p2, s2, config, dataset=ds, epochs=3, batch_size=2,
        learning_rate=base_lr, lr_scheduler="cosine",
        resume=str(tmp_path / "ck" / "checkpoint_epoch2.npz"),
        val_percent=0.2, checkpoint_dir=tmp_path / "ck2", seed=0,
    )
    _, extra3 = read_checkpoint_meta(tmp_path / "ck2" / "checkpoint_epoch3.npz")
    assert extra3["scheduler"]["epoch"] == 3
    # A plateau run resuming this checkpoint starts its schedule fresh.
    p3, s3 = init_unet(jax.random.PRNGKey(2), config)
    _, _, _ = train_model(
        p3, s3, config, dataset=ds, epochs=3, batch_size=2,
        learning_rate=base_lr, lr_scheduler="plateau",
        resume=str(tmp_path / "ck" / "checkpoint_epoch2.npz"),
        val_percent=0.2, save_checkpoint_flag=False, seed=0,
    )


def test_legacy_trainer_combo_one_step():
    """The legacy reference layout's recipe — SGD(momentum 0.9) + plain BCE
    (SURVEY.md §A.1) — through the fused step."""
    from tpu_unet.optim import get_optimizer

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    sgd_init, _ = get_optimizer("sgd")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray((rng.random((2, 32, 32)) > 0.5).astype(np.int32))
    copy = lambda t: jax.tree.map(jnp.array, t)  # the fused step donates

    step = make_train_step(config, optimizer="sgd", dice_weight=0.0)
    p2, s2, o2, loss, gnorm = step(copy(params), copy(state),
                                   sgd_init(params), imgs, masks,
                                   jnp.float32(1e-2))
    assert np.isfinite(float(loss)) and float(loss) > 0
    # Plain BCE: the dice term (>=0 generically) is absent, so the loss sits
    # below the combined criterion on the same inputs.
    step_full = make_train_step(config, optimizer="sgd")
    p3, s3, o3, loss_full, _ = step_full(copy(params), copy(state),
                                         sgd_init(params), imgs, masks,
                                         jnp.float32(1e-2))
    assert float(loss) < float(loss_full)


def test_multiclass_loss_path():
    config = UNetConfig(3, 3, bilinear=False, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    step = make_train_step(config)
    from tpu_unet.optim import rmsprop_init

    opt = rmsprop_init(params)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (2, 32, 32)))
    p2, s2, o2, loss, gnorm = step(params, state, opt, imgs, masks, jnp.float32(1e-3))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.isfinite(float(gnorm))


def test_cli_train_and_predict_e2e(carvana, tmp_path, monkeypatch):
    """Drive the actual CLIs: train 1 epoch then predict a mask image."""
    monkeypatch.chdir(tmp_path)
    ckpt_dir = tmp_path / "checkpoints"
    train_main([
        "-e", "1", "-b", "2", "-l", "1e-3", "-s", "1.0", "-c", "1",
        "--data-dir", str(carvana), "--checkpoint-dir", str(ckpt_dir),
    ])
    ckpt = ckpt_dir / "checkpoint_epoch1.npz"
    assert ckpt.exists()

    img_path = next((carvana / "imgs").glob("*.png"))
    out_path = tmp_path / "mask_out.png"
    predict_main([
        "-m", str(ckpt), "-i", str(img_path), "-o", str(out_path),
        "-s", "1.0", "-c", "1",
    ])
    assert out_path.exists()
    mask = np.asarray(Image.open(out_path))
    assert mask.shape == (48, 64)
    assert set(np.unique(mask)) <= {0, 255}


def test_predict_img_returns_original_resolution(carvana):
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    img = Image.open(next((carvana / "imgs").glob("*.png")))
    mask = predict_img(params, state, config, img, scale_factor=0.5)
    assert mask.shape == (48, 64)  # original size, not the scaled size
    assert mask.dtype == bool


def test_predict_img_device_preprocess_bitexact(carvana):
    """predict_img(device_preprocess=True) — decode-only host, Pillow-bit-
    exact int32 resample on device — returns bitwise the host-path mask."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    img = Image.open(next((carvana / "imgs").glob("*.png")))
    np.testing.assert_array_equal(
        predict_img(params, state, config, img, scale_factor=0.5,
                    device_preprocess=True),
        predict_img(params, state, config, img, scale_factor=0.5),
    )


def test_predict_batched_equals_serial(carvana, tmp_path):
    """iter_predicted_masks with batch_size>1 yields, in input order,
    exactly the serial predict_img masks — including a shape change
    mid-list (flushes the group) and the device-preprocess composition."""
    from tpu_unet.predict import iter_predicted_masks

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    paths = sorted((carvana / "imgs").glob("*.png"))[:5]
    # An odd-sized interloper forces a group flush mid-stream.
    odd = tmp_path / "odd.png"
    Image.open(paths[0]).resize((32, 48)).save(odd)
    files = [str(paths[0]), str(paths[1]), str(odd), str(paths[2]),
             str(paths[3]), str(paths[4])]

    # --tta composes too (ADVICE r3 #1: the claim was previously untested
    # with batch_size>1; tta_logits is batch-generic so serial must match).
    for device_preprocess, tta in ((False, False), (True, False), (False, True)):
        got = list(iter_predicted_masks(
            params, state, config, files, scale_factor=1.0, batch_size=3,
            device_preprocess=device_preprocess, tta=tta))
        assert [f for f, _, _ in got] == files  # input order preserved
        for fname, _, mask in got:
            ref = predict_img(params, state, config, Image.open(fname),
                              scale_factor=1.0, tta=tta)
            np.testing.assert_array_equal(mask, ref)


def test_predict_cli_batch_size(carvana, tmp_path):
    """--batch-size N on the CLI: every output file lands and byte-equals
    the serial run's; incompatible variants are refused."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    from tpu_unet.checkpoint import save_checkpoint

    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, mask_values=[0, 1],
                    extra={"config": config._asdict()})
    imgs = [str(p) for p in sorted((carvana / "imgs").glob("*.png"))[:3]]
    outs_b = [str(tmp_path / f"b{i}.png") for i in range(3)]
    outs_s = [str(tmp_path / f"s{i}.png") for i in range(3)]
    predict_main(["-m", str(ckpt), "-i", *imgs, "-o", *outs_b,
                  "-s", "1.0", "--batch-size", "2"])
    predict_main(["-m", str(ckpt), "-i", *imgs, "-o", *outs_s, "-s", "1.0"])
    for b, s in zip(outs_b, outs_s):
        np.testing.assert_array_equal(np.asarray(Image.open(b)),
                                      np.asarray(Image.open(s)))
    with pytest.raises(SystemExit):
        predict_main(["-m", str(ckpt), "-i", imgs[0], "-s", "1.0",
                      "--batch-size", "2", "--tile", "32"])


def test_mask_to_image_palettes():
    m = np.array([[0, 1], [1, 0]])
    img = mask_to_image(m, [0, 255])
    assert np.asarray(img).tolist() == [[0, 255], [255, 0]]
    img_rgb = mask_to_image(m, [[0, 0, 0], [255, 0, 0]])
    assert np.asarray(img_rgb).shape == (2, 2, 3)


def test_wandb_parity_buffered_steps_grad_histograms_pred_mask(tmp_path, monkeypatch):
    """W&B parity (SURVEY.md section 2 #22) against a fake wandb module:
    per-step losses arrive via the lazy drain (no per-step D2H), and every
    validation log carries Weights/* AND Gradients/* histograms plus the
    true+pred mask pair."""
    import sys
    import types

    import numpy as np

    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
    from tpu_unet.models import UNetConfig, init_unet

    logs = []
    fake = types.ModuleType("wandb")

    class FakeExperiment:
        def __init__(self):
            self.config = types.SimpleNamespace(update=lambda *a, **k: None)

        def log(self, d):
            logs.append(d)

    fake.init = lambda **k: FakeExperiment()
    fake.Histogram = lambda v: ("hist", int(np.asarray(v).size))
    fake.Image = lambda v: ("img", np.asarray(v).shape)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    make_synthetic_carvana(tmp_path / "d", n=16, h=32, w=32)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    _, _, hist = train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=2,
        learning_rate=1e-3, val_percent=0.25, checkpoint_dir=tmp_path / "ck",
        save_checkpoint_flag=False, use_wandb=True, seed=0,
    )

    step_logs = [d for d in logs if "train loss" in d]
    assert len(step_logs) == 6  # 12 train imgs / batch 2
    assert [d["step"] for d in step_logs] == sorted(d["step"] for d in step_logs)

    val_logs = [d for d in logs if "validation Dice" in d]
    assert val_logs
    v = val_logs[0]
    assert any(k.startswith("Weights/") for k in v)
    assert any(k.startswith("Gradients/") for k in v)
    assert set(v["masks"]) == {"true", "pred"}
    # Histograms are device-subsampled (VERDICT r2 weak #4): no leaf fetch
    # may exceed the cap that keeps the per-validation D2H a few MB.
    from tpu_unet.train_logging import _HIST_CAP

    hist_sizes = [val[1] for d in val_logs for k, val in d.items()
                  if isinstance(val, tuple) and val[0] == "hist"]
    assert hist_sizes and all(s <= 2 * _HIST_CAP for s in hist_sizes)


def test_wandb_histograms_with_trailing_partial_batch(tmp_path, monkeypatch):
    """Validation landing on a trailing PARTIAL batch must not feed the
    histogram step an odd shape (a second full fwd+bwd compile — ~10 min
    through the relay at flagship scale): histograms sample the last FULL
    batch instead."""
    import sys
    import types

    import numpy as np

    from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
    from tpu_unet.models import UNetConfig, init_unet

    logs = []
    fake = types.ModuleType("wandb")

    class FakeExperiment:
        def __init__(self):
            self.config = types.SimpleNamespace(update=lambda *a, **k: None)

        def log(self, d):
            logs.append(d)

    fake.init = lambda **k: FakeExperiment()
    fake.Histogram = lambda v: ("hist", int(np.asarray(v).size))
    fake.Image = lambda v: ("img", np.asarray(v).shape)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    # 24 imgs, val 1/12 -> 22 train; batch 4 -> 5 full + one batch of 2;
    # division_step = 22 // 20 = 1 -> a validation fires on the partial
    # batch step too.
    make_synthetic_carvana(tmp_path / "d", n=24, h=32, w=32)
    ds = CarvanaDataset(tmp_path / "d" / "imgs", tmp_path / "d" / "masks",
                        scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)

    train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=4,
        learning_rate=1e-3, val_percent=1 / 12, save_checkpoint_flag=False,
        use_wandb=True, seed=0,
    )
    val_logs = [d for d in logs if "validation Dice" in d]
    assert len(val_logs) == 6  # one per step incl. the partial-batch step
    # Every validation still carries histograms (sampled from a full batch).
    assert all(any(k.startswith("Gradients/") for k in v) for v in val_logs)


def test_keep_checkpoints_retention(carvana, tmp_path, monkeypatch):
    """--keep-checkpoints N prunes all but the newest N epoch checkpoints."""
    monkeypatch.chdir(tmp_path)
    ckpt_dir = tmp_path / "ck"
    train_main([
        "-e", "3", "-b", "2", "-l", "1e-3", "-s", "1.0",
        "--data-dir", str(carvana), "--checkpoint-dir", str(ckpt_dir),
        "--keep-checkpoints", "2",
    ])
    names = sorted(p.name for p in ckpt_dir.glob("checkpoint_epoch*.npz"))
    assert names == ["checkpoint_epoch2.npz", "checkpoint_epoch3.npz"]


def test_save_best_and_history_out(carvana, tmp_path, monkeypatch):
    """--save-best keeps checkpoint_best.npz at the best validation Dice
    (with the score in its metadata); --history-out writes the history
    JSON (both beyond-reference trainer conveniences)."""
    import json

    from tpu_unet.checkpoint import read_checkpoint_meta

    monkeypatch.chdir(tmp_path)
    ckpt_dir = tmp_path / "ck"
    hist_path = tmp_path / "hist.json"
    # 10 imgs, val 20% -> 8 train; batch 1 -> division_step = 8 // 5 = 1:
    # validation (and best tracking) fires every step.
    train_main([
        "-e", "1", "-b", "1", "-l", "1e-3", "-s", "1.0", "-v", "20",
        "--data-dir", str(carvana), "--checkpoint-dir", str(ckpt_dir),
        "--save-best", "--history-out", str(hist_path),
    ])
    best = ckpt_dir / "checkpoint_best.npz"
    assert best.exists()
    hist = json.loads(hist_path.read_text())
    assert len(hist["train_loss"]) == 8
    _, extra = read_checkpoint_meta(best)
    assert extra["val_dice"] == max(hist["val_dice"])


def test_val_per_epoch_cadence(carvana, tmp_path):
    """--val-per-epoch controls the division step: 4 validations with
    val_per_epoch=4 over 8 train images at batch 2 (division_step=1 per
    2-image step → 4 per epoch), vs the reference's 5 (division_step=0 →
    none at this tiny size)."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ds = CarvanaDataset(carvana / "imgs", carvana / "masks", scale=1.0,
                        num_workers=0)
    _, _, hist = train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=2,
        learning_rate=1e-3, val_percent=0.2, val_per_epoch=4,
        save_checkpoint_flag=False, checkpoint_dir=tmp_path, seed=0,
    )
    assert len(hist["val_dice"]) == 4
