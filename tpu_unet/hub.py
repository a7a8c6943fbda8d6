"""Model-hub entry points (reference: hubconf.py — unet_carvana(pretrained,
scale), UNVERIFIED mount, SURVEY.md §2 #20).

The reference exposes ``torch.hub.load(..., 'unet_carvana', pretrained=True,
scale=0.5)`` fetching released Carvana weights. This environment has zero
egress (SURVEY.md §A.2), so ``pretrained=True`` accepts a local weights file
instead: either our .npz checkpoints or the reference's released .pth
(imported through tpu_unet.checkpoint.import_pth — same weights, translated
layouts). With a remote URL and network available, torch.hub's cache dir is
honored.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

from tpu_unet.models import UNetConfig, init_unet

logger = logging.getLogger(__name__)

_RELEASE_URLS = {
    # The upstream publishes scale-0.5 and scale-1.0 Carvana checkpoints via
    # GitHub releases (SURVEY.md §2 #20); resolution requires network.
    0.5: "unet_carvana_scale0.5_epoch2.pth",
    1.0: "unet_carvana_scale1.0_epoch2.pth",
}


def unet_carvana(pretrained: bool = False, scale: float = 0.5, weights_path: str | None = None):
    """Build the Carvana U-Net (3 ch in, 2 classes, transposed-conv decoder).

    Returns (params, state, config, mask_values). ``weights_path`` (or env
    TPU_UNET_WEIGHTS) points at a local .npz/.pth; required for
    pretrained=True since there is no network egress here.
    """
    config = UNetConfig(n_channels=3, n_classes=2, bilinear=False)
    import jax

    params, state = init_unet(jax.random.PRNGKey(0), config)
    mask_values = None
    if pretrained:
        path = weights_path or os.environ.get("TPU_UNET_WEIGHTS")
        if not path:
            raise RuntimeError(
                "pretrained=True needs a local weights file (no network egress): "
                f"pass weights_path= or set TPU_UNET_WEIGHTS. Upstream release file: "
                f"{_RELEASE_URLS.get(scale)}"
            )
        if str(path).endswith(".pth"):
            from tpu_unet.checkpoint import import_pth

            params, state, mask_values = import_pth(path, config)
        else:
            from tpu_unet.checkpoint import load_checkpoint

            params, state, mask_values, _ = load_checkpoint(path, params, state)
    return params, state, config, mask_values


def unet(arch: str = "unet", n_channels: int = 3, n_classes: int = 2,
         bilinear: bool | None = None, base_channels: int = 64,
         recur_t: int = 2, weights_path: str | None = None):
    """Generic hub entry over the whole model zoo (beyond-reference; the
    upstream hubconf exposes only unet_carvana).

    ``arch``: unet | unetpp | attention | r2u | r2attu. ``bilinear`` None
    picks each family's canonical decoder (ConvT for the flagship,
    bilinear for the paper families — same rule as tools/train_demo.py).
    ``weights_path`` loads a self-describing .npz checkpoint or a
    reference-layout .pth (flagship only; the paper families have no torch
    release to import). Returns (params, state, config, mask_values).
    """
    import jax

    if bilinear is None:
        bilinear = arch != "unet"
    config = UNetConfig(n_channels=n_channels, n_classes=n_classes,
                        bilinear=bilinear, base_channels=base_channels,
                        arch=arch, recur_t=recur_t)
    params, state = init_unet(jax.random.PRNGKey(0), config)
    mask_values = None
    if weights_path:
        if str(weights_path).endswith(".pth"):
            if arch != "unet":
                raise ValueError(
                    ".pth import is reference-layout (flagship) only; "
                    f"arch={arch!r} checkpoints are .npz")
            from tpu_unet.checkpoint import import_pth

            params, state, mask_values = import_pth(weights_path, config)
        else:
            from tpu_unet.checkpoint import (load_checkpoint,
                                             read_checkpoint_meta)

            # .npz checkpoints are self-describing: honor the file's config
            # when it disagrees with the caller's args, rather than failing
            # with a raw KeyError/shape error from the array restore
            # (ADVICE r4). Caller args act as defaults, not overrides.
            _, extra = read_checkpoint_meta(weights_path)
            ck_cfg = extra.get("config")
            if ck_cfg is not None:
                file_config = UNetConfig(**ck_cfg)
                if file_config != config:
                    logger.info(
                        "hub.unet: checkpoint is %s — using its config over "
                        "the caller's %s", file_config, config)
                    config = file_config
                    params, state = init_unet(jax.random.PRNGKey(0), config)
            params, state, mask_values, _ = load_checkpoint(
                weights_path, params, state)
    return params, state, config, mask_values
