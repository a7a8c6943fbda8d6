"""RMSprop with exact torch semantics (SURVEY.md §7 "hard part #2").

Parity target (reference: train.py — UNVERIFIED mount, SURVEY.md §2 #13):
``optim.RMSprop(params, lr=1e-5, weight_decay=1e-8, momentum=0.999,
foreach=True)`` — note the reference passes momentum=0.999 to torch's
*momentum* parameter; ``alpha`` stays at its torch default 0.99 and eps at
1e-8. torch's update order (verified against torch-CPU in
tests/test_optim.py):

    g        = g + wd·p                       (weight decay folded into grad)
    sq       = α·sq + (1−α)·g²
    buf      = μ·buf + g / (sqrt(sq) + ε)     (ε OUTSIDE the sqrt)
    p        = p − lr·buf

The learning rate is an *argument to update()*, not baked into the state, so
ReduceLROnPlateau can change it between steps without re-jitting (lr is a
traced scalar inside the compiled train step). State lives in fp32 regardless
of compute dtype. All updates are pure pytree maps — XLA fuses the whole
optimizer into a handful of elementwise kernels.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class RMSpropState(NamedTuple):
    square_avg: Any  # pytree like params
    momentum_buf: Any  # pytree like params


def rmsprop_init(params: Any) -> RMSpropState:
    # Two independent zero trees — sharing one would alias buffers, which
    # breaks donation in jitted steps (same buffer donated twice).
    return RMSpropState(
        square_avg=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params),
        momentum_buf=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params),
    )


def rmsprop_update(
    grads: Any,
    state: RMSpropState,
    params: Any,
    lr: jax.Array | float,
    *,
    alpha: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 1e-8,
    momentum: float = 0.999,
) -> tuple[Any, RMSpropState]:
    """One RMSprop step. Returns (new_params, new_state)."""

    def leaf(p, g, sq, buf):
        g = g.astype(jnp.float32)
        pf = p.astype(jnp.float32)
        if weight_decay != 0:
            g = g + weight_decay * pf
        sq = alpha * sq + (1 - alpha) * jnp.square(g)
        buf = momentum * buf + g / (jnp.sqrt(sq) + eps)
        return (pf - lr * buf).astype(p.dtype), sq, buf

    p_leaves, treedef = jax.tree.flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    sq_leaves = treedef.flatten_up_to(state.square_avg)
    buf_leaves = treedef.flatten_up_to(state.momentum_buf)
    new = [leaf(p, g, sq, buf) for p, g, sq, buf in zip(p_leaves, g_leaves, sq_leaves, buf_leaves)]
    unflatten = treedef.unflatten
    return unflatten([t[0] for t in new]), RMSpropState(
        unflatten([t[1] for t in new]), unflatten([t[2] for t in new])
    )


def clip_grad_norm(grads: Any, max_norm: float) -> tuple[Any, jax.Array]:
    """Global-norm gradient clipping, torch.nn.utils.clip_grad_norm_ parity.

    clip_coef = max_norm / (total_norm + 1e-6), applied only when < 1.
    Returns (clipped_grads, total_norm).
    """
    leaves = jax.tree.leaves(grads)
    total_norm = jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    )
    coef = jnp.minimum(max_norm / (total_norm + 1e-6), 1.0)
    return jax.tree.map(lambda g: (g.astype(jnp.float32) * coef).astype(g.dtype), grads), total_norm
