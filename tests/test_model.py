"""Model-level golden parity vs the torch reference re-implementation
(SURVEY.md §4.1) plus structural checks (§3.3 param counts)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import RefUNet, torch_state_to_jax
from tpu_unet.models import UNetConfig, init_unet, param_count, unet_apply


@pytest.mark.parametrize("bilinear", [False, True])
@pytest.mark.parametrize("hw", [(64, 64), (59, 40)])  # odd sizes hit Up padding
def test_unet_forward_parity_eval(bilinear, hw):
    torch.manual_seed(0)
    model = RefUNet(3, 2, bilinear=bilinear, base=16).eval()
    params, state = torch_state_to_jax(model)
    config = UNetConfig(3, 2, bilinear=bilinear, base_channels=16)

    x = np.random.default_rng(1).standard_normal((2, *hw, 3), dtype=np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours, _ = unet_apply(params, state, jnp.asarray(x), config=config, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("bilinear", [False, True])
def test_unet_forward_parity_train_mode(bilinear):
    """Train-mode BN (batch stats) parity, including running-stat updates."""
    torch.manual_seed(0)
    model = RefUNet(3, 2, bilinear=bilinear, base=8).train()
    params, state = torch_state_to_jax(model)
    config = UNetConfig(3, 2, bilinear=bilinear, base_channels=8)

    x = np.random.default_rng(2).standard_normal((2, 32, 32, 3), dtype=np.float32)
    ref = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    ours, new_state = unet_apply(params, state, jnp.asarray(x), config=config, train=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)
    # Running stats updated torch-style.
    np.testing.assert_allclose(
        np.asarray(new_state["inc"]["bn1"].mean),
        model.inc.net[1].running_mean.detach().numpy(),
        atol=1e-3, rtol=1e-3,
    )


@pytest.mark.parametrize("bilinear,expected_m", [(False, 31.0), (True, 17.3)])
def test_param_counts_match_reference(bilinear, expected_m):
    """SURVEY.md §3.3: ~31M params (bilinear=False), ~17.3M (True)."""
    params, _ = init_unet(
        jax.random.PRNGKey(0), UNetConfig(3, 2, bilinear=bilinear)
    )
    ref = RefUNet(3, 2, bilinear=bilinear)
    n_ref = sum(p.numel() for p in ref.parameters())
    assert param_count(params) == n_ref
    assert abs(param_count(params) / 1e6 - expected_m) < 0.5


def test_init_shapes_match_torch_translation():
    """Our init produces the exact pytree structure of a torch translation."""
    torch.manual_seed(0)
    for bilinear in (False, True):
        model = RefUNet(3, 5, bilinear=bilinear, base=16)
        t_params, t_state = torch_state_to_jax(model)
        j_params, j_state = init_unet(
            jax.random.PRNGKey(0), UNetConfig(3, 5, bilinear=bilinear, base_channels=16)
        )
        t_shapes = jax.tree.map(lambda a: a.shape, t_params)
        j_shapes = jax.tree.map(lambda a: a.shape, j_params)
        assert t_shapes == j_shapes
        assert jax.tree.map(lambda a: a.shape, t_state) == jax.tree.map(
            lambda a: a.shape, j_state
        )


def test_remat_matches_non_remat():
    config = UNetConfig(3, 2, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 32, 32, 3), dtype=np.float32)
    )
    a, _ = unet_apply(params, state, x, config=config, train=False)
    b, _ = unet_apply(params, state, x, config=config, train=False, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_bf16_compute_close_to_fp32():
    """SURVEY.md §4.4: bf16 AMP tolerance."""
    config = UNetConfig(3, 2, bilinear=True, base_channels=8)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 32, 32, 3), dtype=np.float32)
    )
    full, _ = unet_apply(params, state, x, config=config, train=False)
    amp, _ = unet_apply(
        params, state, x, config=config, train=False, compute_dtype=jnp.bfloat16
    )
    assert amp.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(full), np.asarray(amp), atol=0.15, rtol=0.1)


def test_unetpp_rejects_pallas_kernels():
    """--kernels pallas with --arch unetpp must refuse, not silently run XLA."""
    config = UNetConfig(3, 1, bilinear=True, base_channels=8, arch="unetpp")
    params, state = init_unet(jax.random.PRNGKey(0), config)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="unetpp"):
        unet_apply(params, state, x, config=config, train=True, kernels="pallas")
