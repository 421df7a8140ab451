#!/usr/bin/env python
"""End-to-end training recipe: DCNResNet on synthetic data.

Demonstrates the full production path — flax DCN model (DCNv2 Pack blocks
in stages c3-c5), optax optimizer, jit'd train step with donated state,
checkpoint save/restore, and (optionally, with >1 device) data-parallel
sharding over a named mesh.

    python examples/train_dcn_resnet.py [--steps 20] [--width 16]
"""
import argparse
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from modulated_deform_conv_tpu.models import DCNResNet
from modulated_deform_conv_tpu.parallel import make_mesh
from modulated_deform_conv_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--classes", type=int, default=10)
    args = ap.parse_args()

    model = DCNResNet(num_classes=args.classes, depth=50, width=args.width)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 3, 32, 32)),
                    jnp.float32)
    y = jnp.asarray(rng.integers(0, args.classes, (args.batch,)))

    params = model.init(jax.random.key(0), x)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    # Data-parallel sharding when more than one device is visible.
    n_dev = len(jax.devices())
    if n_dev > 1 and args.batch % n_dev == 0:
        mesh = make_mesh((n_dev,), ("data",))
        x = jax.device_put(x, NamedSharding(mesh, P("data")))
        y = jax.device_put(y, NamedSharding(mesh, P("data")))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        print(f"data-parallel over {n_dev} devices")

    def loss_fn(p, x, y):
        logits = model.apply(p, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def train_step(p, s, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for step in range(args.steps):
        params, opt_state, loss = train_step(params, opt_state, x, y)
        losses.append(float(loss))
        print(f"step {step:3d}  loss {losses[-1]:.4f}")

    assert losses[-1] < losses[0], "loss did not decrease"

    with tempfile.TemporaryDirectory() as d:
        path = save_checkpoint(d, params, step=args.steps)
        restored = restore_checkpoint(d, step=args.steps)
        got = jax.tree_util.tree_leaves(restored)[0]
        want = jax.tree_util.tree_leaves(jax.device_get(params))[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        print(f"checkpoint round-trip OK ({path})")

    print(f"train OK: loss {losses[0]:.4f} -> {losses[-1]:.4f}")


if __name__ == "__main__":
    main()
