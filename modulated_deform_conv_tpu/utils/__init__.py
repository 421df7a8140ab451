from .config import DeformConvSpec, ntuple, effective_step

__all__ = ["DeformConvSpec", "ntuple", "effective_step"]
