from .modules import (DeformConv2d, ModulatedDeformConv2d, DeformConv3d,
                      ModulatedDeformConv3d, DeformConv2dPack,
                      ModulatedDeformConv2dPack, DeformConv3dPack,
                      ModulatedDeformConv3dPack)
from .backbone import (ConvBN, ConvBN3d, DCNBottleneck,
                       DCN3dBottleneck, DCNStage, DCNResNet,
                       DCNVideoNet)
from .torch_compat import (from_torch_state_dict, to_torch_state_dict,
                           validate_against_module)

__all__ = [
    "DeformConv2d", "ModulatedDeformConv2d", "DeformConv3d",
    "ModulatedDeformConv3d", "DeformConv2dPack", "ModulatedDeformConv2dPack",
    "DeformConv3dPack", "ModulatedDeformConv3dPack",
    "ConvBN", "ConvBN3d", "DCNBottleneck", "DCN3dBottleneck",
    "DCNStage", "DCNResNet", "DCNVideoNet",
    "from_torch_state_dict", "to_torch_state_dict",
    "validate_against_module",
]
