from .sharding import (make_mesh, required_halo, sharded_deform_conv,
                       sharded_deform_conv2d, sharded_modulated_deform_conv2d,
                       sharded_deform_conv3d, sharded_modulated_deform_conv3d)
from .runtime import initialize_distributed, pod_mesh, device_summary

__all__ = [
    "make_mesh", "required_halo", "sharded_deform_conv",
    "sharded_deform_conv2d", "sharded_modulated_deform_conv2d",
    "sharded_deform_conv3d", "sharded_modulated_deform_conv3d",
    "initialize_distributed", "pod_mesh", "device_summary",
]
