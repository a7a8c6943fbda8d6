"""Optimizer/scheduler parity vs torch (SURVEY.md §7 hard part #2)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tpu_unet.optim import (
    ReduceLROnPlateau,
    clip_grad_norm,
    get_optimizer,
    rmsprop_init,
    rmsprop_update,
)


def test_rmsprop_matches_torch_reference_config(rng):
    """lr=1e-5, wd=1e-8, momentum=0.999 — the reference's exact call."""
    w0 = rng.standard_normal((6, 4), dtype=np.float32)
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.RMSprop([p_t], lr=1e-5, weight_decay=1e-8, momentum=0.999)

    params = {"w": jnp.asarray(w0)}
    state = rmsprop_init(params)

    lr = 1e-5
    for step in range(5):
        g = rng.standard_normal((6, 4), dtype=np.float32)
        opt.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()
        params, state = rmsprop_update({"w": jnp.asarray(g)}, state, params, lr)
        np.testing.assert_allclose(
            np.asarray(params["w"]), p_t.detach().numpy(), atol=1e-7, rtol=1e-5,
            err_msg=f"step {step}",
        )


def test_rmsprop_with_larger_lr_diverges_identically(rng):
    """Bigger lr so differences would be visible if semantics were off."""
    w0 = rng.standard_normal((3, 3), dtype=np.float32)
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.RMSprop([p_t], lr=1e-2, weight_decay=1e-4, momentum=0.9)
    params, state = {"w": jnp.asarray(w0)}, rmsprop_init({"w": jnp.asarray(w0)})
    for _ in range(10):
        g = rng.standard_normal((3, 3), dtype=np.float32)
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()
        params, state = rmsprop_update(
            {"w": jnp.asarray(g)}, state, params, 1e-2,
            weight_decay=1e-4, momentum=0.9,
        )
    np.testing.assert_allclose(np.asarray(params["w"]), p_t.detach().numpy(), atol=1e-5, rtol=1e-4)


def _torch_optimizer(name, params, lr, wd):
    """torch counterpart of get_optimizer(name) at its per-name defaults
    (the menu's contract: sgd = the legacy reference's SGD(momentum=0.9),
    SURVEY.md §A.1; adam/adamw at torch defaults)."""
    if name == "sgd":
        return torch.optim.SGD(params, lr=lr, momentum=0.9, weight_decay=wd)
    if name == "adam":
        return torch.optim.Adam(params, lr=lr, weight_decay=wd)
    if name == "adamw":
        return torch.optim.AdamW(params, lr=lr, weight_decay=wd)
    if name == "rmsprop":
        return torch.optim.RMSprop(params, lr=lr, momentum=0.999, weight_decay=wd)
    raise AssertionError(name)


@pytest.mark.parametrize("name", ["sgd", "adam", "adamw", "rmsprop"])
@pytest.mark.parametrize("wd", [0.0, 1e-2])
def test_optimizer_menu_matches_torch(rng, name, wd):
    """Step-exact vs torch.optim over 8 steps at a visible lr, with and
    without weight decay (decoupled for adamw, L2-folded elsewhere)."""
    lr = 1e-2
    w0 = rng.standard_normal((5, 3), dtype=np.float32)
    b0 = rng.standard_normal((7,), dtype=np.float32)
    p_t = [torch.nn.Parameter(torch.from_numpy(w0.copy())),
           torch.nn.Parameter(torch.from_numpy(b0.copy()))]
    opt_t = _torch_optimizer(name, p_t, lr, wd)

    init, update = get_optimizer(name, weight_decay=wd)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    state = init(params)

    for step in range(8):
        gw = rng.standard_normal((5, 3), dtype=np.float32)
        gb = rng.standard_normal((7,), dtype=np.float32)
        p_t[0].grad = torch.from_numpy(gw.copy())
        p_t[1].grad = torch.from_numpy(gb.copy())
        opt_t.step()
        params, state = update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, state, params, lr)
        for ours, theirs in zip((params["w"], params["b"]), p_t):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.detach().numpy(),
                atol=1e-6, rtol=1e-5, err_msg=f"{name} wd={wd} step {step}",
            )


def test_sgd_nesterov_matches_torch(rng):
    from tpu_unet.optim import sgd_init, sgd_update

    w0 = rng.standard_normal((4, 4), dtype=np.float32)
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.SGD([p_t], lr=1e-2, momentum=0.9, nesterov=True)
    params = {"w": jnp.asarray(w0)}
    state = sgd_init(params)
    for _ in range(6):
        g = rng.standard_normal((4, 4), dtype=np.float32)
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()
        params, state = sgd_update({"w": jnp.asarray(g)}, state, params, 1e-2,
                                   momentum=0.9, nesterov=True)
    np.testing.assert_allclose(np.asarray(params["w"]), p_t.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_momentum_override_threads_through_menu(rng):
    """get_optimizer(momentum=...) must override the per-name default."""
    w0 = rng.standard_normal((3, 3), dtype=np.float32)
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.SGD([p_t], lr=1e-2, momentum=0.5)
    init, update = get_optimizer("sgd", weight_decay=0.0, momentum=0.5)
    params = {"w": jnp.asarray(w0)}
    state = init(params)
    for _ in range(5):
        g = rng.standard_normal((3, 3), dtype=np.float32)
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()
        params, state = update({"w": jnp.asarray(g)}, state, params, 1e-2)
    np.testing.assert_allclose(np.asarray(params["w"]), p_t.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_clip_grad_norm_matches_torch(rng):
    g1 = rng.standard_normal((4, 4), dtype=np.float32) * 3
    g2 = rng.standard_normal((7,), dtype=np.float32) * 3
    t1 = torch.nn.Parameter(torch.zeros(4, 4))
    t2 = torch.nn.Parameter(torch.zeros(7))
    t1.grad = torch.from_numpy(g1.copy())
    t2.grad = torch.from_numpy(g2.copy())
    total = torch.nn.utils.clip_grad_norm_([t1, t2], 1.0)

    clipped, norm = clip_grad_norm({"a": jnp.asarray(g1), "b": jnp.asarray(g2)}, 1.0)
    np.testing.assert_allclose(float(norm), float(total), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["a"]), t1.grad.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["b"]), t2.grad.numpy(), rtol=1e-5)


def test_plateau_matches_torch():
    """Feed an identical metric sequence to ours and torch's scheduler."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.RMSprop([p], lr=1e-5)
    sched_t = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, "max", patience=5)
    sched_j = ReduceLROnPlateau(lr=1e-5, mode="max", patience=5)

    metrics = [0.1, 0.2, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.3, 0.31, 0.31,
               0.31, 0.31, 0.31, 0.31, 0.31, 0.5, 0.4, 0.4]
    for m in metrics:
        sched_t.step(m)
        lr_j = sched_j.step(m)
        lr_t = opt.param_groups[0]["lr"]
        assert abs(lr_j - lr_t) < 1e-12, (m, lr_j, lr_t)


def test_plateau_matches_torch_negative_metrics():
    """Torch applies the rel threshold with NO sign branch — negative
    metrics (e.g. a scheduler driven by -loss) must track torch exactly
    (self-review r3)."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.RMSprop([p], lr=1e-3)
    sched_t = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, "max", patience=2)
    sched_j = ReduceLROnPlateau(lr=1e-3, mode="max", patience=2)

    metrics = [-1.0, -1.00005, -0.9999, -1.0001, -1.0001, -1.0001, -1.0001,
               -0.5, -0.50004, -0.50006, -0.51, -0.51, -0.51]
    for m in metrics:
        sched_t.step(m)
        lr_j = sched_j.step(m)
        lr_t = opt.param_groups[0]["lr"]
        assert abs(lr_j - lr_t) < 1e-12, (m, lr_j, lr_t)


def test_cosine_scheduler_matches_torch():
    """Per-epoch lr sequence vs torch CosineAnnealingLR, incl. past T_max
    (the closed form is periodic, like torch's recursion)."""
    from tpu_unet.optim import CosineAnnealingLR

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sched_t = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=7, eta_min=1e-3)
    sched_j = CosineAnnealingLR(lr=0.1, t_max=7, eta_min=1e-3)
    for epoch in range(14):
        assert abs(opt.param_groups[0]["lr"] - sched_j.lr) < 1e-10, epoch
        sched_t.step()
        sched_j.epoch_end()


def test_step_scheduler_matches_torch():
    from tpu_unet.optim import StepLR

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.5)
    sched_t = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.2)
    sched_j = StepLR(lr=0.5, step_size=3, gamma=0.2)
    for epoch in range(10):
        assert abs(opt.param_groups[0]["lr"] - sched_j.lr) < 1e-12, epoch
        sched_t.step()
        sched_j.epoch_end()


def test_cosine_state_carries_t_max_across_resume():
    """Restoring into a scheduler built with a DIFFERENT t_max (a resumed
    run passing a different --epochs) must continue the SAVED curve."""
    from tpu_unet.optim import CosineAnnealingLR

    a = CosineAnnealingLR(lr=0.1, t_max=10)
    for _ in range(4):
        a.epoch_end()
    b = CosineAnnealingLR(lr=0.1, t_max=12)  # new run: --epochs 12
    b.load_state_dict(a.state_dict())
    assert b.t_max == 10
    ref = CosineAnnealingLR(lr=0.1, t_max=10)
    for _ in range(5):
        ref.epoch_end()
    b.epoch_end()
    assert abs(b.lr - ref.lr) < 1e-15


def test_scheduler_state_roundtrip_continues_curve():
    """state_dict/load_state_dict mid-run resumes the same curve (the
    --resume contract train_model relies on)."""
    from tpu_unet.optim import CosineAnnealingLR

    a = CosineAnnealingLR(lr=0.1, t_max=5)
    for _ in range(2):
        a.epoch_end()
    b = CosineAnnealingLR(lr=0.1, t_max=5)
    b.load_state_dict(a.state_dict())
    ref = CosineAnnealingLR(lr=0.1, t_max=5)
    for _ in range(4):
        ref.epoch_end()
    for _ in range(2):
        a.epoch_end()
        b.epoch_end()
    assert abs(a.lr - ref.lr) < 1e-15
    assert abs(b.lr - ref.lr) < 1e-15


def test_nesterov_through_menu_and_guard(rng):
    """get_optimizer threads nesterov to SGD and rejects it elsewhere
    (torch.optim raises for non-SGD nesterov too)."""
    w0 = rng.standard_normal((3, 3), dtype=np.float32)
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.SGD([p_t], lr=1e-2, momentum=0.9, nesterov=True)
    init, update = get_optimizer("sgd", weight_decay=0.0, nesterov=True)
    params = {"w": jnp.asarray(w0)}
    state = init(params)
    for _ in range(4):
        g = rng.standard_normal((3, 3), dtype=np.float32)
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()
        params, state = update({"w": jnp.asarray(g)}, state, params, 1e-2)
    np.testing.assert_allclose(np.asarray(params["w"]), p_t.detach().numpy(),
                               atol=1e-6, rtol=1e-5)
    with pytest.raises(ValueError, match="nesterov"):
        get_optimizer("adam", nesterov=True)
