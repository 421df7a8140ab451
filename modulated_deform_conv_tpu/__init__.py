"""modulated_deform_conv_tpu — TPU-native deformable convolutions.

A from-scratch JAX/XLA/Pallas framework with the full capability surface of
the CUDA extension CHONSPQX/modulated-deform-conv: forward + backward for
deform_conv2d (DCNv1), modulated_deform_conv2d (DCNv2), deform_conv3d and
modulated_deform_conv3d, with groups / deformable groups / stride / padding /
dilation / bias / in_step, explicit-offset and Pack (learned offset+mask)
module variants, plus a TPU scaling layer (mesh sharding + halo exchange)
the reference does not have.
"""
from .ops import (deform_conv2d, modulated_deform_conv2d, deform_conv3d,
                  modulated_deform_conv3d)
from . import models, parallel, utils

__version__ = "0.1.0"

__all__ = [
    "deform_conv2d", "modulated_deform_conv2d", "deform_conv3d",
    "modulated_deform_conv3d", "models", "parallel", "utils",
]
