"""NHWC TPU-native op layer: convs, batchnorm, pooling, resize, padding."""

from tpu_unet.ops.batchnorm import BNState, batch_norm, init_bn_params, init_bn_state
from tpu_unet.ops.conv import conv2d, conv_transpose2d
from tpu_unet.ops.padding import pad_to_match
from tpu_unet.ops.pooling import max_pool2d
from tpu_unet.ops.resize import resize_bilinear, upsample2x_align_corners

__all__ = [
    "BNState",
    "batch_norm",
    "init_bn_params",
    "init_bn_state",
    "conv2d",
    "conv_transpose2d",
    "pad_to_match",
    "max_pool2d",
    "resize_bilinear",
    "upsample2x_align_corners",
]
