"""On-chip sweep of planar-plan knobs (PT rows, K0, SCH) for cfg3."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import modulated_deform_conv_tpu as mdc
from modulated_deform_conv_tpu.ops.pallas import gathermm as gm
from bench import measure_amortized

B, C, O, k, g, dg = 2, 64, 64, 3, 1, 1
S = (16, 32, 32)
K = k**3
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
off = jnp.asarray(rng.uniform(-2, 2, (B, dg*3*K) + S), jnp.float32)
w = jnp.asarray(rng.standard_normal((O, C//g, k, k, k))*0.05, jnp.float32)
args = (x, off, w)

def run(tag):
    def loss(x, off, w):
        out = mdc.deform_conv3d(x, off, w, None, stride=1, padding=1,
                                groups=g, deformable_groups=dg, impl="pallas",
                                precision="tensorfloat32", offset_bound=None)
        return jnp.sum(out*out)
    def fwdbwd(*a):
        gs = jax.grad(loss, argnums=(0,1,2))(*a)
        return sum(jnp.sum(q) for q in gs)
    t_f = measure_amortized(loss, args, 3)
    t_fb = measure_amortized(fwdbwd, args, 3)
    print(f"{tag}: fwd {t_f*1e3:.2f} ms  fwd+bwd {t_fb*1e3:.2f} ms  "
          f"{B/t_fb:.1f} samples/s", flush=True)

# (PT, K0, SCH) — PT here is the planar pt target (rows*32)
for pt, k0, sch in [(256, 9, 128), (256, 3, 256), (128, 9, 128),
                    (512, 3, 128), (256, 3, 64)]:
    gm._PT_OVERRIDE, gm._K0_OVERRIDE, gm._SCH_OVERRIDE = pt, k0, sch
    run(f"PT={pt} K0={k0} SCH={sch}")
