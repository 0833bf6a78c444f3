from .conv import conv2d, conv_transpose2d, depthwise_conv2d
from .norm import instance_norm, batch_norm
from .resample import (avg_pool, bilinear_upsample, blur_downsample,
                       matlab_gauss2d, gauss_blur_kernel)
from .pad import reflection_pad2d

__all__ = [
    "conv2d", "conv_transpose2d", "depthwise_conv2d",
    "instance_norm", "batch_norm",
    "avg_pool", "bilinear_upsample", "blur_downsample",
    "matlab_gauss2d", "gauss_blur_kernel",
    "reflection_pad2d",
]
