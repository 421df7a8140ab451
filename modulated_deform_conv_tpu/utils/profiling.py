"""Tracing / profiling / observability (SURVEY.md §5).

The reference's only observability is printf (utils.cu:3-24) and two
compile-time launch constants (config.h:32-33).  TPU-native replacements:

* named_scope-annotated ops (XLA trace viewer / perfetto groups them),
* `trace(logdir)` context manager wrapping jax.profiler,
* op cost model: FLOPs + bytes estimators per DeformConvSpec, used for
  achieved-fraction-of-roofline reporting in bench.py and logged via
  `op_stats`.
"""
from __future__ import annotations

import contextlib
import dataclasses
import logging
import math
import time
from typing import Dict, Iterator, Optional, Sequence

import jax

from .config import DeformConvSpec

logger = logging.getLogger("modulated_deform_conv_tpu")


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an XLA profiler trace (view with tensorboard/perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named scope visible in profiler traces."""
    with jax.named_scope(name):
        yield


def op_stats(spec: DeformConvSpec, x_shape: Sequence[int],
             out_channels: int, bytes_per_el: int = 4) -> Dict[str, float]:
    """Analytic cost model of one forward call.

    gemm_flops:    the grouped contraction (the MXU work),
    sample_flops:  multilinear interpolation VPU work (2^nd corners, ~3
                   flops per corner-weight product chain + accumulate),
    gather_bytes:  bytes moved by the offset-driven gather (2^nd corner
                   reads per tap per channel),
    col_bytes:     the materialized column traffic of the unfused path.
    """
    B, C = x_shape[0], x_shape[1]
    OS = spec.out_sizes(tuple(x_shape[2:]))
    P = math.prod(OS)
    K = spec.tap_count
    O = out_channels
    corners = 2 ** spec.ndim
    gemm = 2.0 * B * P * O * (C // spec.groups) * K
    sample = float(B * P * K * C * corners * 3)
    gather = float(B * P * K * C * corners * bytes_per_el)
    cols = float(B * P * K * C * bytes_per_el)
    return {
        "gemm_flops": gemm,
        "sample_flops": sample,
        "gather_bytes": gather,
        "col_bytes": cols,
        "out_elems": float(B * P * O),
    }


class Counters:
    """Process-wide observability counters (SURVEY.md §5).

    Static per-call quantities (halo bytes, collective counts, analytic
    FLOPs) are recorded at trace time by the sharding/op layers; bench
    harnesses divide by measured wall time for achieved-rate reporting.
    Everything is plain Python state — no device traffic.
    """

    def __init__(self):
        self._c: Dict[str, float] = {}

    def add(self, name: str, value: float) -> None:
        self._c[name] = self._c.get(name, 0.0) + float(value)
        logger.debug("counter %s += %s", name, value)

    def get(self, name: str, default: float = 0.0) -> float:
        return self._c.get(name, default)

    def snapshot(self) -> Dict[str, float]:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


counters = Counters()


def halo_stats(spec: DeformConvSpec, x_shape: Sequence[int], halo: int,
               n_spatial_shards: int, bytes_per_el: int = 4,
               dim: int = 0) -> Dict[str, float]:
    """Analytic halo-exchange traffic of one sharded forward call.

    Each interior spatial shard sends `halo` rows up and down along
    spatial dim `dim` (2 ppermute payloads of halo * prod(other spatial
    dims) * C elements); edge shards send one.  The backward transposes
    the exchange, doubling the traffic per training step.  For a 2-axis
    spatial mesh call this once per sharded dim (the second exchange's
    payload grows by the first dim's halo rows; pass the extended shape
    for an exact figure).
    """
    C = x_shape[1]
    spatial = list(x_shape[2:])
    rest = math.prod(spatial[:dim] + spatial[dim + 1:]) if spatial else 1
    B = x_shape[0]
    row_bytes = C * rest * bytes_per_el * B
    sends = 2 * (n_spatial_shards - 1)            # up + down ring edges
    payload = halo * row_bytes
    return {
        "halo_rows": float(halo),
        "halo_bytes_fwd": float(sends * payload),
        "halo_bytes_fwdbwd": float(2 * sends * payload),
        "ppermute_calls_fwd": float(2 if halo and n_spatial_shards > 1
                                    else 0),
    }


@dataclasses.dataclass
class Timer:
    """Wall-clock timer with block_until_ready, for quick perf checks."""
    name: str = "timer"
    _t0: Optional[float] = None
    elapsed: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        logger.info("%s: %.3f ms", self.name, self.elapsed * 1e3)
        return False
