"""Optimizer menu: torch-parity SGD / Adam / AdamW next to the RMSprop
default.

The modern reference trains with RMSprop only (reference: train.py ~L40,
UNVERIFIED mount, SURVEY.md §2 #13 — implemented in optim/rmsprop.py); the
LEGACY layout's trainer used ``SGD(momentum=0.9)`` (SURVEY.md §A.1), which
makes ``sgd`` here a parity-contingency component, like submit.py and
postprocess/crf.py. Adam/AdamW are beyond-reference conveniences.

Every optimizer follows the same contract as rmsprop_update so the rest of
the framework (ZeRO-1, tensor-parallel state sharding, checkpointing,
donation) composes without special cases:

- state is a NamedTuple whose leading fields are fp32 pytrees mirroring the
  params tree (parallel/zero.py and parallel/tensor.py shard those 1/N per
  chip); any trailing non-param-shaped field (Adam's scalar ``step``) is
  replicated by the generalized sharding helpers.
- ``update(grads, state, params, lr) -> (new_params, new_state)`` with lr a
  traced scalar (ReduceLROnPlateau changes it without re-jitting) and all
  hyperparameters closed over at build time (static at trace time).
- math runs in fp32 regardless of compute dtype (params cast in/out), the
  same mixed-precision contract as rmsprop_update.

Update rules are step-exact against torch.optim (tests/test_optim.py):

SGD (dampening=0):             Adam:                        AdamW:
  g += wd*p                      g += wd*p                    p *= 1 - lr*wd
  buf = mu*buf + g               t += 1                       (then Adam, wd=0)
  g = g + mu*buf  (nesterov)     m = b1*m + (1-b1)*g
    | buf         (plain)        v = b2*v + (1-b2)*g^2
  p -= lr*g                      p -= lr/(1-b1^t) * m /
                                      (sqrt(v)/sqrt(1-b2^t) + eps)

torch's zero-state first SGD step assigns ``buf = g``; with buf initialized
to zeros, ``mu*0 + g`` is the same value, so zeros-init is exact.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from tpu_unet.optim.rmsprop import rmsprop_init, rmsprop_update


class SGDState(NamedTuple):
    momentum_buf: Any  # pytree like params


class AdamState(NamedTuple):
    exp_avg: Any  # pytree like params
    exp_avg_sq: Any  # pytree like params
    step: Any  # scalar int32 (bias-correction counter; replicated under zero/tp)


def _zeros_like_f32(params):
    return jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)


def sgd_init(params: Any) -> SGDState:
    return SGDState(momentum_buf=_zeros_like_f32(params))


def sgd_update(
    grads: Any,
    state: SGDState,
    params: Any,
    lr: jax.Array | float,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> tuple[Any, SGDState]:
    def leaf(p, g, buf):
        g = g.astype(jnp.float32)
        pf = p.astype(jnp.float32)
        if weight_decay != 0:
            g = g + weight_decay * pf
        buf = momentum * buf + g
        d = g + momentum * buf if nesterov else buf
        return (pf - lr * d).astype(p.dtype), buf

    p_leaves, treedef = jax.tree.flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    buf_leaves = treedef.flatten_up_to(state.momentum_buf)
    new = [leaf(p, g, b) for p, g, b in zip(p_leaves, g_leaves, buf_leaves)]
    return treedef.unflatten([t[0] for t in new]), SGDState(
        treedef.unflatten([t[1] for t in new])
    )


def adam_init(params: Any) -> AdamState:
    return AdamState(
        exp_avg=_zeros_like_f32(params),
        exp_avg_sq=_zeros_like_f32(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lr: jax.Array | float,
    *,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decoupled: bool = False,
) -> tuple[Any, AdamState]:
    """torch.optim.Adam (``decoupled=False``) / AdamW (``decoupled=True``)."""
    b1, b2 = betas
    t = state.step + 1
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(jnp.float32(b1), tf)
    bc2 = 1.0 - jnp.power(jnp.float32(b2), tf)
    step_size = lr / bc1
    sqrt_bc2 = jnp.sqrt(bc2)

    def leaf(p, g, m, v):
        g = g.astype(jnp.float32)
        pf = p.astype(jnp.float32)
        if weight_decay != 0:
            if decoupled:
                pf = pf * (1.0 - lr * weight_decay)
            else:
                g = g + weight_decay * pf
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * jnp.square(g)
        denom = jnp.sqrt(v) / sqrt_bc2 + eps
        return (pf - step_size * m / denom).astype(p.dtype), m, v

    p_leaves, treedef = jax.tree.flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    m_leaves = treedef.flatten_up_to(state.exp_avg)
    v_leaves = treedef.flatten_up_to(state.exp_avg_sq)
    new = [leaf(p, g, m, v)
           for p, g, m, v in zip(p_leaves, g_leaves, m_leaves, v_leaves)]
    return treedef.unflatten([t[0] for t in new]), AdamState(
        treedef.unflatten([t[1] for t in new]),
        treedef.unflatten([t[2] for t in new]),
        t,
    )


OPTIMIZERS = ("rmsprop", "sgd", "adam", "adamw")


def get_optimizer(
    name: str,
    *,
    weight_decay: float = 1e-8,
    momentum: float | None = None,
    nesterov: bool = False,
) -> tuple[Callable[[Any], Any], Callable[..., tuple[Any, Any]]]:
    """Resolve an optimizer name to ``(init_fn, update_fn)``.

    ``momentum`` None takes the per-optimizer default (0.999 for RMSprop —
    the reference's value; 0.9 for SGD — the legacy reference's, SURVEY.md
    §A.1). Adam/AdamW ignore it (betas stay at torch defaults); ``nesterov``
    applies to SGD only (torch raises for the others too).
    """
    if nesterov and name != "sgd":
        raise ValueError("nesterov momentum is an SGD option")
    if name == "rmsprop":
        mom = 0.999 if momentum is None else momentum
        return rmsprop_init, functools.partial(
            rmsprop_update, weight_decay=weight_decay, momentum=mom
        )
    if name == "sgd":
        mom = 0.9 if momentum is None else momentum
        return sgd_init, functools.partial(
            sgd_update, weight_decay=weight_decay, momentum=mom,
            nesterov=nesterov,
        )
    if name == "adam":
        return adam_init, functools.partial(
            adam_update, weight_decay=weight_decay
        )
    if name == "adamw":
        return adam_init, functools.partial(
            adam_update, weight_decay=weight_decay, decoupled=True
        )
    raise ValueError(f"unknown optimizer {name!r} (choose from {OPTIMIZERS})")
