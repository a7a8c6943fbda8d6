from tpu_unet.optim.optimizers import (
    OPTIMIZERS,
    AdamState,
    SGDState,
    adam_init,
    adam_update,
    get_optimizer,
    sgd_init,
    sgd_update,
)
from tpu_unet.optim.plateau import ReduceLROnPlateau
from tpu_unet.optim.schedulers import (
    SCHEDULERS,
    ConstantLR,
    CosineAnnealingLR,
    StepLR,
    get_scheduler,
)
from tpu_unet.optim.rmsprop import (
    RMSpropState,
    clip_grad_norm,
    rmsprop_init,
    rmsprop_update,
)

__all__ = [
    "OPTIMIZERS",
    "SCHEDULERS",
    "AdamState",
    "ConstantLR",
    "CosineAnnealingLR",
    "StepLR",
    "get_scheduler",
    "ReduceLROnPlateau",
    "RMSpropState",
    "SGDState",
    "adam_init",
    "adam_update",
    "clip_grad_norm",
    "get_optimizer",
    "rmsprop_init",
    "rmsprop_update",
    "sgd_init",
    "sgd_update",
]
