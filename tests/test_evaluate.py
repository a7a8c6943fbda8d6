"""evaluate() parity vs a torch transcription of the reference's evaluate.py
(SURVEY.md §2 #16, §3.4 — incl. the background-channel exclusion)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.torch_ref import RefUNet, torch_state_to_jax
from tpu_unet.evaluate import eval_step, evaluate
from tpu_unet.models import UNetConfig


def torch_reference_evaluate(net, images, masks, n_classes):
    # Transcribed from the SURVEY.md §3.4 spec of reference evaluate.py.
    def dice_coeff(inp, tgt, reduce_batch_first=False, epsilon=1e-6):
        sum_dim = (-1, -2) if inp.dim() == 2 or not reduce_batch_first else (-1, -2, -3)
        inter = 2 * (inp * tgt).sum(dim=sum_dim)
        sets_sum = inp.sum(dim=sum_dim) + tgt.sum(dim=sum_dim)
        sets_sum = torch.where(sets_sum == 0, inter, sets_sum)
        return ((inter + epsilon) / (sets_sum + epsilon)).mean()

    with torch.inference_mode():
        pred = net(images)
        if n_classes == 1:
            out = (torch.sigmoid(pred) > 0.5).float().squeeze(1)
            return dice_coeff(out, masks.float())
        else:
            oh_pred = F.one_hot(pred.argmax(dim=1), n_classes).permute(0, 3, 1, 2).float()
            oh_mask = F.one_hot(masks, n_classes).permute(0, 3, 1, 2).float()
            return dice_coeff(
                oh_pred[:, 1:].flatten(0, 1), oh_mask[:, 1:].flatten(0, 1)
            )


def test_eval_binary_matches_reference():
    torch.manual_seed(0)
    net = RefUNet(3, 1, bilinear=True, base=8).eval()
    params, state = torch_state_to_jax(net)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    masks = rng.integers(0, 2, (2, 32, 32))

    ref = torch_reference_evaluate(
        net, torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(masks), 1
    )
    dice, _ = eval_step(params, state, jnp.asarray(x), jnp.asarray(masks), config=config)
    np.testing.assert_allclose(float(dice), float(ref), atol=1e-5)


def test_eval_multiclass_excludes_background():
    torch.manual_seed(1)
    net = RefUNet(3, 4, bilinear=False, base=8).eval()
    params, state = torch_state_to_jax(net)
    config = UNetConfig(3, 4, bilinear=False, base_channels=8)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    masks = rng.integers(0, 4, (2, 32, 32))

    ref = torch_reference_evaluate(
        net, torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(masks), 4
    )
    dice, _ = eval_step(params, state, jnp.asarray(x), jnp.asarray(masks), config=config)
    np.testing.assert_allclose(float(dice), float(ref), atol=1e-5)


def test_evaluate_averages_over_batches():
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    import jax as _jax

    from tpu_unet.models import init_unet

    params, state = init_unet(_jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(2)
    loader = [
        {"image": rng.random((2, 32, 32, 3), dtype=np.float32),
         "mask": rng.integers(0, 2, (2, 32, 32))}
        for _ in range(3)
    ]
    dice, iou = evaluate(params, state, loader, config)
    assert 0.0 <= dice <= 1.0 and 0.0 <= iou <= 1.0


def test_evaluate_cli_data_parallel(tmp_path):
    """The standalone evaluate CLI over the DP mesh equals the
    single-device CLI run (VERDICT r2 next #1 surface)."""
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.data import make_synthetic_carvana
    from tpu_unet.evaluate import main as evaluate_main
    from tpu_unet.models import init_unet

    make_synthetic_carvana(tmp_path / "d", n=8, h=32, w=48)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, mask_values=[0, 255],
                    extra={"config": config._asdict()})

    common = ["-m", str(ckpt), "--data-dir", str(tmp_path / "d"),
              "-s", "1.0", "-b", "8"]
    solo = evaluate_main(common)
    dp = evaluate_main(common + ["--data-parallel"])
    np.testing.assert_allclose(dp, solo, rtol=1e-5)


def test_per_class_mean_reproduces_scalar():
    """mean(per-class Dice[1:]) == the background-excluded scalar, and the
    binary per-class vector is the scalar itself."""
    from tpu_unet.evaluate import eval_step_per_class
    from tpu_unet.models import init_unet

    rng = np.random.default_rng(3)
    # Multiclass:
    config = UNetConfig(3, 4, bilinear=False, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(1), config)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 4, (2, 32, 32)))
    dice, iou = eval_step(params, state, x, masks, config=config)
    dice_c, iou_c = eval_step_per_class(params, state, x, masks, config=config)
    assert dice_c.shape == (4,) and iou_c.shape == (4,)
    np.testing.assert_allclose(float(jnp.mean(dice_c[1:])), float(dice), atol=1e-6)
    np.testing.assert_allclose(float(jnp.mean(iou_c[1:])), float(iou), atol=1e-6)
    # Binary:
    config1 = UNetConfig(3, 1, bilinear=True, base_channels=8)
    p1, s1 = init_unet(jax.random.PRNGKey(2), config1)
    m1 = jnp.asarray(rng.integers(0, 2, (2, 32, 32)))
    d1, i1 = eval_step(p1, s1, x, m1, config=config1)
    d1c, i1c = eval_step_per_class(p1, s1, x, m1, config=config1)
    np.testing.assert_allclose(float(d1c[0]), float(d1), atol=1e-6)
    np.testing.assert_allclose(float(i1c[0]), float(i1), atol=1e-6)


def test_evaluate_cli_per_class_and_tta(tmp_path, capsys):
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.data import make_synthetic_carvana
    from tpu_unet.evaluate import main as evaluate_main
    from tpu_unet.models import init_unet

    make_synthetic_carvana(tmp_path / "d", n=4, h=32, w=48)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, mask_values=[0, 255],
                    extra={"config": config._asdict()})
    evaluate_main(["-m", str(ckpt), "--data-dir", str(tmp_path / "d"),
                   "-s", "1.0", "-b", "4", "--per-class", "--tta"])
    out = capsys.readouterr().out
    assert "class 0:" in out and "Dice:" in out


def test_evaluate_cli_per_class_data_parallel(tmp_path, capsys):
    """--per-class composed with --data-parallel: the single-sweep scalar
    derivation matches the plain CLI run."""
    from tpu_unet.checkpoint import save_checkpoint
    from tpu_unet.data import make_synthetic_carvana
    from tpu_unet.evaluate import main as evaluate_main
    from tpu_unet.models import init_unet

    make_synthetic_carvana(tmp_path / "d", n=8, h=32, w=48)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, mask_values=[0, 255],
                    extra={"config": config._asdict()})
    common = ["-m", str(ckpt), "--data-dir", str(tmp_path / "d"),
              "-s", "1.0", "-b", "8"]
    solo = evaluate_main(common)
    capsys.readouterr()
    dp_pc = evaluate_main(common + ["--data-parallel", "--per-class"])
    out = capsys.readouterr().out
    assert "class 0:" in out
    np.testing.assert_allclose(dp_pc, solo, rtol=1e-5)
