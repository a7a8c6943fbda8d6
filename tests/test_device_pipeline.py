"""Device-side preprocessing parity (fast path; host PIL path stays the
parity-exact default)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax.numpy as jnp

from tpu_unet.data.device_pipeline import (
    device_preprocess_images,
    device_preprocess_masks,
)


@pytest.mark.parametrize("out_hw", [(24, 32), (48, 64), (37, 53)])
def test_bicubic_matches_torch(rng, out_hw):
    """Device bicubic ≡ torch F.interpolate(bicubic, half-pixel)."""
    img = rng.integers(0, 255, (2, 48, 64, 3)).astype(np.uint8)
    ours = device_preprocess_images(jnp.asarray(img), out_h=out_hw[0], out_w=out_hw[1])
    t = torch.from_numpy(img.astype(np.float32).transpose(0, 3, 1, 2)) / 255.0
    ref = F.interpolate(t, size=out_hw, mode="bicubic", align_corners=False)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3
    )


@pytest.mark.parametrize("out_hw", [(24, 32), (17, 23)])
def test_nearest_mask_matches_pil(rng, out_hw):
    """Device NEAREST mask resize bitwise-matches PIL's convention."""
    mask = (rng.integers(0, 2, (40, 56)) * 255).astype(np.uint8)
    pil = np.asarray(
        Image.fromarray(mask).resize((out_hw[1], out_hw[0]), resample=Image.NEAREST)
    )
    ours = device_preprocess_masks(
        jnp.asarray(mask[None]), jnp.asarray([0, 255]), out_h=out_hw[0], out_w=out_hw[1]
    )[0]
    # Compare indices: PIL values → indices.
    pil_idx = (pil == 255).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(ours), pil_idx)


def test_rgb_palette_mapping(rng):
    mask = np.zeros((1, 8, 8, 3), np.uint8)
    mask[0, 4:, :] = [255, 0, 0]
    values = jnp.asarray([[0, 0, 0], [255, 0, 0]])
    idx = device_preprocess_masks(jnp.asarray(mask), values, out_h=8, out_w=8)
    assert idx[0, 0, 0] == 0 and idx[0, 7, 0] == 1
