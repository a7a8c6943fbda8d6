"""Mean-field CRF refinement (legacy-layout contingency, SURVEY.md §A.1)."""

import numpy as np

import jax.numpy as jnp

from tpu_unet.postprocess import crf_refine, crf_refine_binary


def test_crf_preserves_shape_and_simplex(rng):
    img = jnp.asarray(rng.random((1, 24, 32, 3), dtype=np.float32))
    probs = jnp.asarray(rng.random((1, 24, 32, 4), dtype=np.float32))
    probs = probs / probs.sum(-1, keepdims=True)
    out = crf_refine(img, probs, iters=3)
    assert out.shape == probs.shape
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_crf_denoises_salt_and_pepper():
    """Isolated flipped pixels inside a uniform region get smoothed away."""
    h = w = 32
    img = jnp.ones((1, h, w, 3)) * 0.5  # uniform image → no edges
    fg = np.zeros((1, h, w), np.float32)
    fg[0, : h // 2] = 0.9  # top half foreground
    fg[0, h // 4, w // 2] = 0.1      # noise inside fg
    fg[0, 3 * h // 4, w // 2] = 0.9  # noise inside bg
    refined = np.asarray(crf_refine_binary(img, jnp.asarray(fg), iters=5))
    assert refined[0, h // 4, w // 2] > 0.5      # flipped back to fg
    assert refined[0, 3 * h // 4, w // 2] < 0.5  # flipped back to bg


def test_crf_respects_edges():
    """A strong image edge blocks label propagation across it."""
    h = w = 32
    img = np.zeros((1, h, w, 3), np.float32)
    img[0, :, w // 2 :] = 1.0  # hard vertical edge
    fg = np.full((1, h, w), 0.5, np.float32)
    fg[0, :, : w // 2] = 0.95  # confident fg on the left only
    refined = np.asarray(crf_refine_binary(jnp.asarray(img), jnp.asarray(fg), iters=5))
    # Left stays foreground; right (beyond the edge) is not dragged to fg
    # nearly as much as the area just left of the edge.
    assert refined[0, h // 2, w // 4] > 0.8
    assert refined[0, h // 2, w // 2 + 4] < refined[0, h // 2, w // 2 - 4]
