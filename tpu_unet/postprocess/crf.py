"""Mean-field dense-CRF mask refinement, pure JAX (device-side).

Capability coverage for the legacy reference layout's ``utils/crf.py``
(SURVEY.md §A.1 — pydensecrf post-processing of predicted masks; the modern
layout dropped it). pydensecrf's permutohedral-lattice bilateral filter has
no TPU analog, so this implements the standard mean-field iteration with:

  * a separable Gaussian SPATIAL kernel (smoothness pairwise term), and
  * an APPEARANCE term approximated by modulating messages with a local
    color-affinity map (images with similar neighbouring colors propagate
    labels; strong edges block propagation),

all as jit-compiled convolutions/elementwise ops — fixed iteration count via
``lax.scan``, static shapes, no host sync. This is an approximation of the
full dense CRF (documented), adequate for its role in the reference: snapping
mask borders to image edges.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


def _blur(x: jax.Array, kernel: jnp.ndarray) -> jax.Array:
    """Separable Gaussian blur over H and W of [N,H,W,C]."""
    r = kernel.shape[0] // 2
    k_h = kernel.reshape(-1, 1, 1, 1)  # [kH,1,1,1]
    k_w = kernel.reshape(1, -1, 1, 1)
    c = x.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    kh = jnp.tile(k_h, (1, 1, 1, c)) * jnp.eye(c)[None, None]
    kw = jnp.tile(k_w, (1, 1, 1, c)) * jnp.eye(c)[None, None]
    x = lax.conv_general_dilated(x, kh, (1, 1), [(r, r), (0, 0)], dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn)
    return x


@functools.partial(
    jax.jit, static_argnames=("iters", "spatial_sigma", "compat", "edge_sigma")
)
def crf_refine(
    image: jax.Array,
    probs: jax.Array,
    *,
    iters: int = 5,
    spatial_sigma: float = 3.0,
    compat: float = 3.0,
    edge_sigma: float = 0.1,
) -> jax.Array:
    """Refine class probabilities with mean-field smoothing.

    image: [N,H,W,3] floats in [0,1]; probs: [N,H,W,C] softmax/sigmoid
    probabilities. Returns refined probabilities, same shape.
    """
    unary = -jnp.log(jnp.clip(probs, 1e-8, 1.0))

    # Edge-stopping map from local color gradients: messages attenuate where
    # the image has strong edges (appearance term approximation).
    gy = jnp.abs(jnp.diff(image, axis=1, prepend=image[:, :1]))
    gx = jnp.abs(jnp.diff(image, axis=2, prepend=image[:, :, :1]))
    grad = jnp.sum(gy + gx, axis=-1, keepdims=True)
    affinity = jnp.exp(-grad / edge_sigma)  # ~1 inside regions, ~0 at edges

    radius = int(2 * spatial_sigma)
    kernel = _gaussian_kernel1d(spatial_sigma, radius)

    def step(q, _):
        msg = _blur(q * affinity, kernel) - q * affinity  # exclude self
        # Potts compatibility: penalize disagreement with neighbours.
        energy = unary + compat * (jnp.sum(msg, axis=-1, keepdims=True) - msg)
        q_new = jax.nn.softmax(-energy, axis=-1)
        return q_new, None

    q0 = jax.nn.softmax(-unary, axis=-1)
    q, _ = lax.scan(step, q0, None, length=iters)
    return q


def crf_refine_binary(image, fg_probs, **kwargs):
    """Binary convenience wrapper: [N,H,W] foreground probs → refined probs."""
    probs = jnp.stack([1.0 - fg_probs, fg_probs], axis=-1)
    return crf_refine(image, probs, **kwargs)[..., 1]
