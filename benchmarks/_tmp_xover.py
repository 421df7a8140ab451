import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import modulated_deform_conv_tpu as mdc
from bench import measure_amortized
B, C, O, k, g, dg = 2, 64, 64, 3, 1, 1
S = (16, 32, 32)
K = k**3
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, C) + S), jnp.float32)
w = jnp.asarray(rng.standard_normal((O, C//g, k, k, k))*0.05, jnp.float32)

def run(tag, impl, ob, offscale):
    off = jnp.asarray(rng.uniform(-offscale, offscale, (B, dg*3*K) + S), jnp.float32)
    args = (x, off, w)
    def loss(x, off, w):
        out = mdc.deform_conv3d(x, off, w, None, stride=1, padding=1, groups=g,
                                deformable_groups=dg, impl=impl,
                                precision="tensorfloat32", offset_bound=ob)
        return jnp.sum(out*out)
    def fwdbwd(*a):
        gs = jax.grad(loss, argnums=(0,1,2))(*a)
        return sum(jnp.sum(q) for q in gs)
    t_f = measure_amortized(loss, args, 3)
    t_fb = measure_amortized(fwdbwd, args, 3)
    print(f"{tag}: fwd {t_f*1e3:.3f} ms  fwd+bwd {t_fb*1e3:.3f} ms  {B/t_fb:.1f} samples/s", flush=True)

# +-1 data: shiftblend with ob=1 (27-pair window) vs gathermm (data-adaptive)
run("sb  ob=1 data+-1", "shiftblend", 1.0, 1.0)
run("gm       data+-1", "pallas",     None, 1.0)
# +-1.5 data: sb window pairs for b=1.5 -> W=4^3? vs gm
run("sb  ob=1.5 data+-1.5", "shiftblend", 1.5, 1.5)
run("gm         data+-1.5", "pallas",     None, 1.5)
