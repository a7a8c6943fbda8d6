"""Pallas TPU kernel tier — the framework's native-performance layer
(replaces what cuDNN provided for the reference; SURVEY.md §2.1)."""

from tpu_unet.kernels.fused_conv import fused_conv3x3_scale_relu

__all__ = ["fused_conv3x3_scale_relu"]
