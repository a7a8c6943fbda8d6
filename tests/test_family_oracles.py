"""Block-level torch oracles for the beyond-reference family building blocks
(VERDICT r3 weak #3: the family suites checked structure/shapes/params but no
independent implementation verified the gate/recurrent NUMERICS).

Like tests/torch_ref.py, these torch modules are written FROM THE PAPER
FORMULATIONS the model docstrings cite — additive attention gate per Oktay
et al. (arXiv:1804.03999, models/attention_unet.py) and the recurrent
residual RRCNN block per Alom et al. (arXiv:1802.06955, models/r2u_unet.py)
— not copied from any published implementation. Weights transfer
torch→jax (OIHW→HWIO), then train-mode outputs, updated running stats, and
eval-mode outputs must agree.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tpu_unet.models.attention_unet import _gate_apply, _gate_init
from tpu_unet.models.r2u_unet import _rec_unit_apply, _rrcnn_apply, _rrcnn_init
from tpu_unet.ops.batchnorm import BNState


def _j(t: torch.Tensor) -> jnp.ndarray:
    # COPY, don't alias: jnp.asarray on CPU can zero-copy the torch buffer,
    # and torch's train-mode BN updates running stats IN PLACE — an aliased
    # transfer would silently see torch's post-forward stats.
    return jnp.array(t.detach().numpy(), copy=True)


def _conv_w(mod: nn.Conv2d):
    return _j(mod.weight).transpose(2, 3, 1, 0)


def _bn_pytree(mod: nn.BatchNorm2d):
    p = {"scale": _j(mod.weight), "bias": _j(mod.bias)}
    s = BNState(mean=_j(mod.running_mean), var=_j(mod.running_var))
    return p, s


def _nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


class TorchAttentionGate(nn.Module):
    """att(g, x) = x * sigmoid(BN(psi(relu(BN(W_g g) + BN(W_x x))))),
    W_g/W_x/psi 1x1 convs without bias, F_int = x_ch // 2 (paper Fig. 2)."""

    def __init__(self, g_ch: int, x_ch: int):
        super().__init__()
        f = max(1, x_ch // 2)
        self.wg = nn.Conv2d(g_ch, f, 1, bias=False)
        self.bn_g = nn.BatchNorm2d(f)
        self.wx = nn.Conv2d(x_ch, f, 1, bias=False)
        self.bn_x = nn.BatchNorm2d(f)
        self.psi = nn.Conv2d(f, 1, 1, bias=False)
        self.bn_psi = nn.BatchNorm2d(1)

    def forward(self, g, x):
        a = torch.relu(self.bn_g(self.wg(g)) + self.bn_x(self.wx(x)))
        a = torch.sigmoid(self.bn_psi(self.psi(a)))
        return x * a


def _gate_pytrees(mod: TorchAttentionGate):
    params = {"wg": {"w": _conv_w(mod.wg)},
              "wx": {"w": _conv_w(mod.wx)},
              "psi": {"w": _conv_w(mod.psi)}}
    state = {}
    for name in ("bn_g", "bn_x", "bn_psi"):
        params[name], state[name] = _bn_pytree(getattr(mod, name))
    return params, state


def test_attention_gate_matches_torch_train_and_eval():
    torch.manual_seed(0)
    g_ch, x_ch = 12, 10
    mod = TorchAttentionGate(g_ch, x_ch)
    # Non-trivial BN affine + warm running stats so eval mode separates
    # from train mode.
    with torch.no_grad():
        for bnm in (mod.bn_g, mod.bn_x, mod.bn_psi):
            bnm.weight.uniform_(0.5, 1.5)
            bnm.bias.uniform_(-0.3, 0.3)
    g = torch.randn(2, g_ch, 16, 12)
    x = torch.randn(2, x_ch, 16, 12)

    # Transfer BEFORE the torch forward: train mode mutates running stats.
    params, state = _gate_pytrees(mod)
    gj, xj = _nhwc(g), _nhwc(x)
    mod.train()
    ref_train = mod(g, x)

    out, new_state = _gate_apply(params, state, gj, xj, train=True)
    np.testing.assert_allclose(
        np.asarray(out), ref_train.detach().numpy().transpose(0, 2, 3, 1),
        atol=1e-5, rtol=1e-5)

    # Running-stat update parity (momentum 0.1, unbiased var — torch
    # semantics, ops/batchnorm.py).
    for name in ("bn_g", "bn_x", "bn_psi"):
        bnm = getattr(mod, name)
        np.testing.assert_allclose(np.asarray(new_state[name].mean),
                                   bnm.running_mean.numpy(),
                                   atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state[name].var),
                                   bnm.running_var.numpy(),
                                   atol=1e-6, rtol=1e-5)

    mod.eval()
    ref_eval = mod(g, x)
    out_eval, _ = _gate_apply(params, new_state, gj, xj, train=False)
    np.testing.assert_allclose(
        np.asarray(out_eval), ref_eval.detach().numpy().transpose(0, 2, 3, 1),
        atol=1e-5, rtol=1e-5)


class TorchRecUnit(nn.Module):
    """One shared (3x3 conv → BN → ReLU) unit applied recurrently with input
    injection: h = unit(x); t times h = unit(x + h). The shared BN updates
    its running stats at EVERY application, in order (paper §3: the same
    module is stepped t+1 times)."""

    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(ch)

    def forward(self, x, t: int):
        h = torch.relu(self.bn(self.conv(x)))
        for _ in range(t):
            h = torch.relu(self.bn(self.conv(x + h)))
        return h


class TorchRRCNN(nn.Module):
    """RRCNN: x' = proj_1x1(x); out = x' + rec2(rec1(x'))."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.proj = nn.Conv2d(cin, cout, 1, bias=True)
        self.rec1 = TorchRecUnit(cout)
        self.rec2 = TorchRecUnit(cout)

    def forward(self, x, t: int):
        x = self.proj(x)
        return x + self.rec2(self.rec1(x, t), t)


def _rec_unit_pytree(mod: TorchRecUnit):
    bn_p, bn_s = _bn_pytree(mod.bn)
    return {"conv": {"w": _conv_w(mod.conv)}, "bn": bn_p}, {"bn": bn_s}


def test_rec_unit_matches_torch_shared_bn_threading():
    """The subtle part of the recurrence: ONE BatchNorm stepped t+1 times —
    batch stats recomputed per application, running stats EMA'd per
    application. A once-per-block stat update would diverge here."""
    torch.manual_seed(1)
    ch, t = 9, 2
    mod = TorchRecUnit(ch)
    with torch.no_grad():
        mod.bn.weight.uniform_(0.5, 1.5)
        mod.bn.bias.uniform_(-0.3, 0.3)
    x = torch.randn(2, ch, 14, 11)

    params, state = _rec_unit_pytree(mod)
    mod.train()
    ref = mod(x, t)
    out, new_state = _rec_unit_apply(params, state, _nhwc(x), t=t, train=True)
    np.testing.assert_allclose(
        np.asarray(out), ref.detach().numpy().transpose(0, 2, 3, 1),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn"].mean),
                               mod.bn.running_mean.numpy(),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn"].var),
                               mod.bn.running_var.numpy(),
                               atol=1e-6, rtol=1e-5)


def test_rrcnn_block_matches_torch_train_and_eval():
    torch.manual_seed(2)
    cin, cout, t = 5, 8, 2
    mod = TorchRRCNN(cin, cout)
    with torch.no_grad():
        for rec in (mod.rec1, mod.rec2):
            rec.bn.weight.uniform_(0.5, 1.5)
            rec.bn.bias.uniform_(-0.3, 0.3)
    x = torch.randn(2, cin, 12, 10)

    params = {"proj": {"w": _conv_w(mod.proj),
                       "b": _j(mod.proj.bias)}}
    state = {}
    params["rec1"], state["rec1"] = _rec_unit_pytree(mod.rec1)
    params["rec2"], state["rec2"] = _rec_unit_pytree(mod.rec2)

    mod.train()
    ref = mod(x, t)
    out, new_state = _rrcnn_apply(params, state, _nhwc(x), t=t, train=True)
    np.testing.assert_allclose(
        np.asarray(out), ref.detach().numpy().transpose(0, 2, 3, 1),
        atol=1e-5, rtol=1e-5)

    mod.eval()
    ref_eval = mod(x, t)
    out_eval, _ = _rrcnn_apply(params, new_state, _nhwc(x), t=t, train=False)
    np.testing.assert_allclose(
        np.asarray(out_eval),
        ref_eval.detach().numpy().transpose(0, 2, 3, 1),
        atol=1e-5, rtol=1e-5)


def test_rrcnn_init_pytree_matches_oracle_structure():
    """init_r2u building blocks produce exactly the pytree the oracle
    transfer builds — a key mismatch would make .pth interop silently drop
    leaves."""
    params, state = _rrcnn_init(jax.random.PRNGKey(0), 5, 8)
    mod = TorchRRCNN(5, 8)
    oracle_p = {"proj": {"w": _conv_w(mod.proj),
                         "b": _j(mod.proj.bias)}}
    oracle_s = {}
    oracle_p["rec1"], oracle_s["rec1"] = _rec_unit_pytree(mod.rec1)
    oracle_p["rec2"], oracle_s["rec2"] = _rec_unit_pytree(mod.rec2)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(oracle_p)
    assert jax.tree_util.tree_structure(state) == \
        jax.tree_util.tree_structure(oracle_s)
    same_shapes = jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, params, oracle_p)
    assert all(jax.tree_util.tree_leaves(same_shapes))


def test_attention_gate_init_pytree_matches_oracle_structure():
    params, state = _gate_init(jax.random.PRNGKey(0), 12, 10)
    mod = TorchAttentionGate(12, 10)
    oracle_p, oracle_s = _gate_pytrees(mod)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(oracle_p)
    assert jax.tree_util.tree_structure(state) == \
        jax.tree_util.tree_structure(oracle_s)
