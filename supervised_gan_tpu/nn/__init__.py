from .core import (Ctx, Layer, Sequential, Conv2d, ConvTranspose2d,
                   BatchNorm2d, InstanceNorm2d, ReLU, LeakyReLU, Tanh,
                   Sigmoid, Dropout, GaussianNoise, ReflectionPad2d,
                   AvgPool2d, Upsample, count_params, jit_init)
from .factory import define_G, define_D, get_norm_layer, print_network
from .losses import gan_loss, gan_loss_multiclass, weighted_l1_loss, bce_loss, cross_entropy_2d

__all__ = [
    "Ctx", "Layer", "Sequential", "Conv2d", "ConvTranspose2d",
    "BatchNorm2d", "InstanceNorm2d", "ReLU", "LeakyReLU", "Tanh",
    "Sigmoid", "Dropout", "GaussianNoise", "ReflectionPad2d",
    "AvgPool2d", "Upsample", "count_params", "jit_init",
    "define_G", "define_D", "get_norm_layer", "print_network",
    "gan_loss", "gan_loss_multiclass", "weighted_l1_loss", "bce_loss",
    "cross_entropy_2d",
]
