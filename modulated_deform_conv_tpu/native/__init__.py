"""ctypes bindings for the native C++ CPU oracle (mdc_cpu.cpp).

Builds the shared library on first use with g++ (cached next to the
source).  The oracle runs in float64 and provides forward and backward for
all four ops; it is the independent native counterpart of the reference's
C++/CUDA layer (SURVEY.md §2.1) used to cross-check the JAX implementation.
"""
from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mdc_cpu.cpp")
_SO = os.path.join(_DIR, "libmdc_cpu.so")
_lib = None


class NativeBuildError(RuntimeError):
    pass


def build(force: bool = False) -> str:
    """Compile the oracle shared library if needed; returns its path."""
    if force or (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", str(e))
            raise NativeBuildError(f"g++ build failed: {msg}") from e
    return _SO


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.mdc_forward.argtypes = [ip] + [dp] * 6
        lib.mdc_forward.restype = None
        lib.mdc_backward.argtypes = [ip] + [dp] * 10
        lib.mdc_backward.restype = None
        _lib = lib
    return _lib


def _dims(nd, B, C, O, S, kernel, stride, pad, dil, g, dg) -> np.ndarray:
    return np.asarray([nd, B, C, O, *S, *kernel, *stride, *pad, *dil, g, dg],
                      np.int64)


def _dptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _out_sizes(S, kernel, stride, pad, dil):
    return tuple((S[d] + 2 * pad[d] - (dil[d] * (kernel[d] - 1) + 1))
                 // stride[d] + 1 for d in range(len(S)))


def forward(x, offset, mask, weight, bias, stride, padding, dilation, groups,
            deformable_groups) -> np.ndarray:
    """fp64 forward; returns (B, O, *OS)."""
    lib = _get_lib()
    x = np.ascontiguousarray(x, np.float64)
    offset = np.ascontiguousarray(offset, np.float64)
    weight = np.ascontiguousarray(weight, np.float64)
    mask = None if mask is None else np.ascontiguousarray(mask, np.float64)
    bias = None if bias is None else np.ascontiguousarray(bias, np.float64)
    B, C = x.shape[:2]
    S = x.shape[2:]
    nd = len(S)
    kernel = weight.shape[2:]
    O = weight.shape[0]
    OS = _out_sizes(S, kernel, stride, padding, dilation)
    out = np.zeros((B, O) + OS, np.float64)
    d = _dims(nd, B, C, O, S, kernel, stride, padding, dilation, groups,
              deformable_groups)
    lib.mdc_forward(d.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    _dptr(x), _dptr(offset), _dptr(mask), _dptr(weight),
                    _dptr(bias), _dptr(out))
    return out


def backward(x, offset, mask, weight, grad_out, stride, padding, dilation,
             groups, deformable_groups, with_bias=True):
    """fp64 backward; returns (grad_x, grad_offset, grad_mask, grad_weight,
    grad_bias) — grad_mask/grad_bias None when absent."""
    lib = _get_lib()
    x = np.ascontiguousarray(x, np.float64)
    offset = np.ascontiguousarray(offset, np.float64)
    weight = np.ascontiguousarray(weight, np.float64)
    grad_out = np.ascontiguousarray(grad_out, np.float64)
    mask = None if mask is None else np.ascontiguousarray(mask, np.float64)
    B, C = x.shape[:2]
    S = x.shape[2:]
    nd = len(S)
    kernel = weight.shape[2:]
    O = weight.shape[0]
    gx = np.zeros_like(x)
    goff = np.zeros_like(offset)
    gmask = None if mask is None else np.zeros_like(mask)
    gw = np.zeros_like(weight)
    gb = np.zeros((O,), np.float64) if with_bias else None
    d = _dims(nd, B, C, O, S, kernel, stride, padding, dilation, groups,
              deformable_groups)
    lib.mdc_backward(d.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                     _dptr(x), _dptr(offset), _dptr(mask), _dptr(weight),
                     _dptr(grad_out), _dptr(gx), _dptr(goff), _dptr(gmask),
                     _dptr(gw), _dptr(gb))
    return gx, goff, gmask, gw, gb
