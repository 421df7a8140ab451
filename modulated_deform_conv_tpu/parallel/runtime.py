"""Multi-host runtime plumbing (SURVEY.md §5 distributed backend).

The reference has no communication backend at all (§2.3); on TPU pods the
equivalent layer is jax.distributed + XLA collectives over ICI/DCN.  These
helpers make multi-host startup and mesh construction one-liners and fail
fast (the reference swallows kernel launch errors, deformable_conv.cu:110-114
— we do the opposite).
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger("modulated_deform_conv_tpu")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on single process / TPU VMs where
    the runtime auto-detects)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:  # already initialized / 1-proc
        logger.info("jax.distributed.initialize skipped: %s", e)


def pod_mesh(data: Optional[int] = None, space: int = 1,
             axis_names: Tuple[str, str] = ("data", "space")) -> Mesh:
    """Mesh over all global devices: (data, space) with data inferred.

    Keeps the spatial axis innermost so halo-exchange ppermutes ride
    neighboring ICI links; the batch all-reduce crosses DCN only between
    hosts, matching the scaling-book recipe (shard fast-changing axes on
    ICI).
    """
    devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % space:
            raise ValueError(f"{n} devices not divisible by space={space}")
        data = n // space
    if data * space != n:
        raise ValueError(f"mesh {data}x{space} != {n} devices")
    return Mesh(np.asarray(devices).reshape(data, space), axis_names)


def device_summary() -> str:
    d = jax.devices()
    return (f"{len(d)} devices on {jax.process_count()} processes; "
            f"first: {d[0].platform}:{getattr(d[0], 'device_kind', '?')}")
