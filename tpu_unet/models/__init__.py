from tpu_unet.models.unet import (
    Params,
    State,
    UNetConfig,
    init_unet,
    param_count,
    unet_apply,
)

__all__ = ["Params", "State", "UNetConfig", "init_unet", "param_count", "unet_apply"]
