from .modules import (DeformConv2d, ModulatedDeformConv2d, DeformConv3d,
                      ModulatedDeformConv3d, DeformConv2dPack,
                      ModulatedDeformConv2dPack, DeformConv3dPack,
                      ModulatedDeformConv3dPack)
from .backbone import ConvBN, DCNBottleneck, DCNStage, DCNResNet
from .torch_compat import (from_torch_state_dict, to_torch_state_dict,
                           validate_against_module)

__all__ = [
    "DeformConv2d", "ModulatedDeformConv2d", "DeformConv3d",
    "ModulatedDeformConv3d", "DeformConv2dPack", "ModulatedDeformConv2dPack",
    "DeformConv3dPack", "ModulatedDeformConv3dPack",
    "ConvBN", "DCNBottleneck", "DCNStage", "DCNResNet",
    "from_torch_state_dict", "to_torch_state_dict",
    "validate_against_module",
]
