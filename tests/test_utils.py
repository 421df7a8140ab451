"""Checkpoint round-trip, profiling cost model, runtime helpers."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from modulated_deform_conv_tpu.utils.checkpoint import (save_checkpoint,
                                                        restore_checkpoint,
                                                        latest_step)
from modulated_deform_conv_tpu.utils.profiling import op_stats, annotate
from modulated_deform_conv_tpu.utils.config import DeformConvSpec
from modulated_deform_conv_tpu.parallel.runtime import (pod_mesh,
                                                        device_summary)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3),
            "nested": {"b": jnp.ones((4,), jnp.float32)}}
    p = save_checkpoint(str(tmp_path / "ckpt"), tree, step=3)
    assert os.path.exists(p)
    assert latest_step(str(tmp_path / "ckpt")) == 3
    got = restore_checkpoint(str(tmp_path / "ckpt"), target=tree, step=3)
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(tree["w"]))
    np.testing.assert_array_equal(np.asarray(got["nested"]["b"]),
                                  np.asarray(tree["nested"]["b"]))


def test_op_stats():
    spec = DeformConvSpec.make(2, 3, stride=1, padding=1, groups=4,
                               deformable_groups=4)
    st = op_stats(spec, (8, 256, 56, 56), out_channels=256)
    # fwd GEMM flops: 2*B*P*O*(C/g)*K
    assert st["gemm_flops"] == 2 * 8 * 56 * 56 * 256 * 64 * 9
    assert st["gather_bytes"] > 0


def test_annotate_and_mesh():
    with annotate("unit-test-scope"):
        _ = jnp.ones(3) + 1
    mesh = pod_mesh(space=2)
    assert mesh.shape["space"] == 2
    assert "devices" in device_summary()
