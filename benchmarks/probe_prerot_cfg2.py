import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import modulated_deform_conv_tpu as mdc
from modulated_deform_conv_tpu.ops.pallas import shiftblend as sb
from bench import measure_amortized

B, C, O, H, W, k, g, dg = 8, 256, 256, 56, 56, 3, 4, 4
K = k*k
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
off = jnp.asarray(rng.uniform(-2, 2, (B, dg*2*K, H, W)), jnp.float32)
m = jnp.asarray(rng.uniform(0, 1, (B, dg*K, H, W)), jnp.float32)
w = jnp.asarray(rng.standard_normal((O, C//g, k, k))*0.05, jnp.float32)
b = jnp.zeros((O,), jnp.float32)
args = (x, off, m, w, b)

def run(tag):
    def loss(*a):
        out = mdc.modulated_deform_conv2d(*a, stride=1, padding=1, groups=g,
                                          deformable_groups=dg, impl="shiftblend",
                                          precision="tensorfloat32", offset_bound=2.0)
        return jnp.sum(out*out)
    def fwdbwd(*a):
        gs = jax.grad(loss, argnums=(0,1,2,3,4))(*a)
        return sum(jnp.sum(q) for q in gs)
    t_f = measure_amortized(loss, args, 4)
    t_fb = measure_amortized(fwdbwd, args, 4)
    print(f"{tag}: fwd {t_f*1e3:.3f} ms  fwd+bwd {t_fb*1e3:.3f} ms  {B/t_fb:.1f} samples/s", flush=True)

for prerot, blk in [(1, 0), (-1, 0), (1, 1024), (-1, 1024)]:
    sb._PREROT_OVERRIDE, sb._BLK_OVERRIDE = prerot, blk
    run(f"prerot={'on' if prerot>0 else 'off'} blk={blk or 'default512'}")
