from .pixel_shuffle import pixel_shuffle, space_to_depth
from .torch_init import torch_conv_bias_init, torch_conv_kernel_init

__all__ = [
    "pixel_shuffle",
    "space_to_depth",
    "torch_conv_kernel_init",
    "torch_conv_bias_init",
]
