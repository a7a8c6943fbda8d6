"""Gradient accumulation (--accum-steps): microbatch scan inside the one
compiled train step. Beyond-reference memory lever (no reference
counterpart); semantics = torch-style sequential microbatches between
optimizer updates (per-microbatch BN and Dice, averaged gradient)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.data import CarvanaDataset, make_synthetic_carvana
from tpu_unet.losses import dice_loss  # noqa: F401  (import parity check)
from tpu_unet.models import UNetConfig, init_unet, unet_apply
from tpu_unet.optim import clip_grad_norm, rmsprop_init
from tpu_unet.train import compute_loss, make_train_step, train_model


def _toy_batch(n=8, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.random((n, h, w, 3), dtype=np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (n, h, w)))
    return imgs, masks


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_step_matches_manual_microbatch_loop(accum):
    """The fused accum step ≡ hand-rolled microbatch loop: strided
    microbatches (rows j::A), sequential BN threading, averaged grads,
    clip, one RMSprop update — exact in fp32."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    imgs, masks = _toy_batch(n=8)

    # The step donates (params, bn, opt) — hand it copies so the manual
    # loop below can still read the originals. return_grads exposes the
    # clipped averaged gradient, the quantity accumulation defines; the
    # post-RMSprop params are NOT compared because g/(sqrt(v)+eps) at the
    # first step turns any fp32 reassociation of a near-zero g into an
    # O(lr/sqrt(1-momentum)) param delta (sign-sensitive, unbounded rtol).
    copy = lambda t: jax.tree.map(jnp.copy, t)
    step = make_train_step(config, accum_steps=accum, return_grads=True)
    p1, s1, o1, loss1, gnorm1, g1 = step(copy(params), copy(state), copy(opt),
                                         imgs, masks, jnp.float32(1e-3))

    # Manual reference: same microbatch assignment and order.
    def loss_fn(p, bn, im, mk):
        logits, new_bn = unet_apply(p, bn, im, config=config, train=True)
        return compute_loss(logits, mk, config.n_classes), new_bn

    bn = state
    gsum = jax.tree.map(jnp.zeros_like, params)
    lsum = 0.0
    for j in range(accum):
        (l, bn), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bn, imgs[j::accum], masks[j::accum])
        gsum = jax.tree.map(jnp.add, gsum, g)
        lsum = lsum + l
    grads = jax.tree.map(lambda g: g / accum, gsum)
    grads, gnorm2 = clip_grad_norm(grads, 1.0)

    assert np.isclose(float(loss1), float(lsum) / accum, rtol=1e-6)
    assert np.isclose(float(gnorm1), float(gnorm2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(bn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_accum_equals_plain_when_batch_fits_microbatch_semantics():
    """A=1 vs A=2: losses differ (per-microbatch BN/Dice) but both train —
    sanity that the accum path optimizes, not just runs."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    step = make_train_step(config, accum_steps=2)
    imgs, masks = _toy_batch(n=4)
    loss_first = None
    for _ in range(8):
        params, state, opt, loss, _ = step(params, state, opt, imgs, masks,
                                           jnp.float32(1e-2))
        if loss_first is None:
            loss_first = float(loss)
    assert float(loss) < loss_first  # same batch 8× must fit it


def test_accum_partial_batch_runs_unaccumulated():
    """n % accum != 0 (trailing partial batch): the step's static branch
    runs the batch whole — same result as an accum=1 step."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    imgs, masks = _toy_batch(n=3)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    step_a = make_train_step(config, accum_steps=2)
    step_p = make_train_step(config, accum_steps=1)
    pa, sa, oa, la, _ = step_a(copy(params), copy(state), copy(opt),
                               imgs, masks, jnp.float32(1e-3))
    pp, sp, op_, lp, _ = step_p(copy(params), copy(state), copy(opt),
                                imgs, masks, jnp.float32(1e-3))
    assert np.isclose(float(la), float(lp), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_accum_composes_with_data_parallel():
    """accum=2 under GSPMD DP ≡ accum=2 single-device: the strided
    microbatch assignment keeps every device contributing to every
    microbatch, so the global math is unchanged."""
    from tpu_unet.parallel.mesh import image_sharding, make_mesh, replicated

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    opt = rmsprop_init(params)
    imgs, masks = _toy_batch(n=8)

    copy = lambda t: jax.tree.map(jnp.copy, t)
    step = make_train_step(config, accum_steps=2, return_grads=True)
    p1, s1, o1, loss1, _, g1 = step(copy(params), copy(state), copy(opt),
                                    imgs, masks, jnp.float32(1e-3))

    mesh = make_mesh()
    rep = replicated(mesh)
    sh = image_sharding(mesh)
    pd = jax.device_put(params, rep)
    sd = jax.device_put(state, rep)
    od = jax.device_put(opt, rep)
    imd = jax.device_put(imgs, sh)
    mkd = jax.device_put(masks, sh)
    p2, s2, o2, loss2, _, g2 = step(pd, sd, od, imd, mkd, jnp.float32(1e-3))

    assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
    # Grads, not post-RMSprop params: the first-step g/(sqrt(v)+eps) is
    # sign-sensitive for near-zero g under cross-program fp32 reassociation.
    # atol matches test_parallel's train-mode grad tolerance (BN chains
    # amplify the partitioned reductions' reassociation).
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_accum_train_model_e2e(tmp_path):
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    root = tmp_path / "data"
    make_synthetic_carvana(root, n=8, h=48, w=64)
    ds = CarvanaDataset(root / "imgs", root / "masks", scale=1.0, num_workers=0)
    params, state, hist = train_model(
        params, state, config,
        dataset=ds, epochs=2, batch_size=4, learning_rate=1e-3,
        val_percent=0.25, checkpoint_dir=tmp_path / "ckpts", seed=0,
        accum_steps=2,
    )
    losses = hist["train_loss"]
    assert len(losses) == 4 and np.all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_accum_must_divide_batch_size(tmp_path):
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="accum-steps"):
        train_model(params, state, config, dataset=[], epochs=1,
                    batch_size=5, accum_steps=2)


def test_accum_with_wandb_histograms(tmp_path, monkeypatch):
    """--accum-steps + --wandb: validation histograms still arrive (the
    hist step samples a MICROBATCH so its program never exceeds the
    accumulation's memory/compile envelope)."""
    import sys
    import types

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

    root = tmp_path / "d"
    make_synthetic_carvana(root, n=16, h=32, w=32)
    ds = CarvanaDataset(root / "imgs", root / "masks", scale=1.0, num_workers=0)
    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    train_model(
        params, state, config, dataset=ds, epochs=1, batch_size=2,
        learning_rate=1e-3, val_percent=0.25, checkpoint_dir=tmp_path / "ck",
        save_checkpoint_flag=False, use_wandb=True, seed=0, accum_steps=2,
    )
    val_logs = [d for d in logs if "validation Dice" in d]
    assert val_logs and any(k.startswith("Gradients/") for k in val_logs[-1])


def test_accum_composes_with_optimizer_menu():
    """accum=2 with a non-RMSprop optimizer: the scan accumulates the
    gradient UPSTREAM of the update, so the adam accum step consumes
    exactly the direct-autodiff average of the strided microbatch grads
    (clipped once, at the average — not per microbatch), and amp stays
    finite."""
    from tpu_unet.optim import clip_grad_norm, get_optimizer

    config = UNetConfig(3, 1, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    adam_init, _ = get_optimizer("adam")
    imgs, masks = _toy_batch(n=4)
    copy = lambda t: jax.tree.map(jnp.copy, t)

    step = make_train_step(config, optimizer="adam", accum_steps=2,
                           return_grads=True)
    pa, sa, oa, la, gn, ga = step(copy(params), copy(state),
                                  adam_init(params), imgs, masks,
                                  jnp.float32(1e-3))

    # Manual reference: direct autodiff per strided microbatch, BN state
    # threaded in order, averaged THEN clipped once (the accum contract).
    def loss_fn(p, bn, im, mk):
        logits, new_bn = unet_apply(p, bn, im, config=config, train=True)
        return compute_loss(logits, mk, config.n_classes), new_bn

    bn = state
    gsum = jax.tree.map(jnp.zeros_like, params)
    lsum = 0.0
    for j in range(2):
        (l, bn), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bn, imgs[j::2], masks[j::2])
        gsum = jax.tree.map(jnp.add, gsum, g)
        lsum = lsum + l
    gavg = jax.tree.map(lambda g: g / 2, gsum)
    gavg, gn2 = clip_grad_norm(gavg, 1.0)

    np.testing.assert_allclose(float(la), float(lsum) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(gn), float(gn2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gavg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # The adam update actually ran: zero-state adam moves params ~sign(g)*lr.
    moved = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(params)))
    assert 0 < moved < 3e-3
    assert int(oa.step) == 1

    # amp composition smoke: bf16 compute, fp32 adamw state, finite loss.
    step_amp = make_train_step(config, optimizer="adamw", accum_steps=2,
                               amp=True)
    _, _, _, lamp, _ = step_amp(copy(params), copy(state), adam_init(params),
                                imgs, masks, jnp.float32(1e-3))
    assert np.isfinite(float(lamp))
