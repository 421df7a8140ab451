"""PyTorch checkpoint interop for the module layer.

Users migrating from the reference (CHONSPQX/modulated-deform-conv) carry
trained `state_dict`s whose entries are the reference modules' parameters
(/root/reference/modulated_deform_conv.py:375-381 weight/bias;
:734-738, :759-768 Pack `conv_offset`/`conv_mask` predictor convs).  This
module converts those checkpoints to/from the flax variable trees of the
equivalent modules in models/modules.py.

Layouts match by construction — weights are stored OIHW/OIDHW on both
sides and the offset/mask channel orders are identical (SURVEY §2.4) — so
conversion is a pure name-tree mapping with shape validation; no
transposition and no numeric change.

Accepted values: torch tensors (detached and copied to host), numpy
arrays, or jax arrays.  torch itself is only required when a torch tensor
is passed or `to_torch_state_dict(..., as_torch=True)` is requested.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

_PACK_CHILDREN = ("conv_offset", "conv_mask")


def _to_numpy(v) -> np.ndarray:
    """Host numpy copy of a torch tensor / jax array / array-like."""
    if hasattr(v, "detach"):          # torch tensor (avoid importing torch)
        v = v.detach()
        if hasattr(v, "cpu"):
            v = v.cpu()
        return np.asarray(v)
    return np.asarray(v)


def from_torch_state_dict(state_dict: Mapping[str, Any], prefix: str = "",
                          dtype=jnp.float32) -> Dict[str, Any]:
    """Reference-module ``state_dict`` -> flax ``{"params": ...}`` tree.

    `prefix` selects a submodule's entries (e.g. ``"backbone.dcn3."``) and
    is stripped; everything else is ignored.  Recognized keys (after the
    prefix): ``weight``, ``bias``, ``conv_offset.weight``,
    ``conv_offset.bias``, ``conv_mask.weight``, ``conv_mask.bias`` —
    exactly the parameters of the reference's eight modules.
    """
    params: Dict[str, Any] = {}
    seen = False
    for key, val in state_dict.items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        arr = jnp.asarray(_to_numpy(val), dtype)
        if name in ("weight", "bias"):
            params[name] = arr
            seen = True
        else:
            for child in _PACK_CHILDREN:
                if name == f"{child}.weight":
                    params.setdefault(child, {})["weight"] = arr
                    seen = True
                elif name == f"{child}.bias":
                    params.setdefault(child, {})["bias"] = arr
                    seen = True
    if not seen:
        raise KeyError(
            f"no deformable-conv parameters under prefix {prefix!r}; "
            f"state_dict keys: {list(state_dict)[:8]}...")
    if "weight" not in params:
        raise KeyError(f"missing 'weight' under prefix {prefix!r}")
    return {"params": params}


def to_torch_state_dict(variables: Mapping[str, Any], prefix: str = "",
                        as_torch: bool = False) -> Dict[str, Any]:
    """Flax ``variables`` of a modules.py module -> reference state_dict.

    Inverse of :func:`from_torch_state_dict`.  With ``as_torch=True`` the
    values are ``torch.Tensor``s (requires torch), else numpy arrays.
    """
    params = variables.get("params", variables)
    out: Dict[str, Any] = {}
    for name in ("weight", "bias"):
        if name in params:
            out[prefix + name] = np.asarray(params[name])
    for child in _PACK_CHILDREN:
        sub = params.get(child)
        if sub:
            for name in ("weight", "bias"):
                if name in sub:
                    out[f"{prefix}{child}.{name}"] = np.asarray(sub[name])
    if as_torch:
        import torch
        out = {k: torch.from_numpy(v.copy()) for k, v in out.items()}
    return out


def validate_against_module(module, variables: Mapping[str, Any],
                            x_shape: Optional[tuple] = None) -> None:
    """Raise if `variables` cannot parameterize `module`.

    Checks the parameter tree structure and shapes by initializing the
    module abstractly (no FLOPs) and comparing shapes leaf by leaf.
    """
    import jax

    if x_shape is None:
        nd = module._ndim
        x_shape = (1, module.in_channels) + (max(module._kernel()) * 4,) * nd
    x = jnp.zeros(x_shape, module.param_dtype)
    args = (x,)
    # Explicit-offset modules also take offset (and mask) inputs.
    from . import modules as _m
    if not isinstance(module, _m._PackBase):
        from ..utils.config import ntuple
        nd, K = module._ndim, int(np.prod(module._kernel()))
        k = module._kernel()
        s = ntuple(module.stride, nd)
        p = ntuple(module.padding, nd)
        d = ntuple(module.dilation, nd)
        spec_os = tuple(
            (x_shape[2 + i] + 2 * p[i] - (d[i] * (k[i] - 1) + 1)) // s[i] + 1
            for i in range(nd))
        off = jnp.zeros((x_shape[0], module.deformable_groups * nd * K)
                        + spec_os, module.param_dtype)
        args = (x, off)
        if module._modulated:
            mask = jnp.zeros((x_shape[0], module.deformable_groups * K)
                             + spec_os, module.param_dtype)
            args = (x, off, mask)
    ref = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args)

    def walk(path, a, b):
        a_leaves = a if isinstance(a, Mapping) else None
        b_leaves = b if isinstance(b, Mapping) else None
        if (a_leaves is None) != (b_leaves is None):
            raise ValueError(f"structure mismatch at {path!r}")
        if a_leaves is None:
            if tuple(a.shape) != tuple(b.shape):
                raise ValueError(
                    f"shape mismatch at {path!r}: checkpoint "
                    f"{tuple(b.shape)} vs module {tuple(a.shape)}")
            return
        missing = set(a_leaves) - set(b_leaves)
        extra = set(b_leaves) - set(a_leaves)
        if missing or extra:
            raise ValueError(
                f"param-tree mismatch at {path!r}: missing {sorted(missing)}"
                f", unexpected {sorted(extra)}")
        for k in a_leaves:
            walk(f"{path}/{k}", a_leaves[k], b_leaves[k])

    walk("params", ref["params"], variables.get("params", variables))
