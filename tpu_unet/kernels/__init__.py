"""Pallas TPU kernel tier — the framework's native-performance layer
(replaces what cuDNN provided for the reference; SURVEY.md §2.1)."""

from tpu_unet.kernels.fused_conv import fused_conv3x3_scale_relu
from tpu_unet.kernels.pooling import max_pool2x2

__all__ = ["fused_conv3x3_scale_relu", "max_pool2x2"]
