from .api import (deform_conv2d, modulated_deform_conv2d, deform_conv3d,
                  modulated_deform_conv3d)
from .core import deform_conv_columns, deform_conv_nd

__all__ = [
    "deform_conv2d", "modulated_deform_conv2d", "deform_conv3d",
    "modulated_deform_conv3d", "deform_conv_columns", "deform_conv_nd",
]
