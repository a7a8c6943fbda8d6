from tpu_unet.optim.plateau import ReduceLROnPlateau
from tpu_unet.optim.rmsprop import (
    RMSpropState,
    clip_grad_norm,
    rmsprop_init,
    rmsprop_update,
)

__all__ = [
    "ReduceLROnPlateau",
    "RMSpropState",
    "clip_grad_norm",
    "rmsprop_init",
    "rmsprop_update",
]
