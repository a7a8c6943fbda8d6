"""Pixel classification losses with torch-parity reductions.

Parity targets (reference: train.py — criterion selection, UNVERIFIED mount,
SURVEY.md §2 #13): ``nn.CrossEntropyLoss()`` for n_classes > 1 and
``nn.BCEWithLogitsLoss()`` for the binary head, both with default mean
reduction over every pixel. Implemented in the numerically-stable log-sum-exp
forms; everything fuses into the loss epilogue under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Binary cross-entropy on logits, mean reduction. Shapes broadcastable."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*z + log(1 + exp(-|x|)) — the stable BCE-with-logits form.
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Softmax cross-entropy with integer labels, mean over all pixels.

    logits: [N,H,W,C] (channels-last), labels: [N,H,W] int.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(picked)
