"""Microbenchmark of the fused 7-point kernels (ops/pallas/seven_point):
per-apply wall time with 100 applies CHAINED INSIDE one jit (amortizes
the axon-tunnel dispatch wobble that made single-call timings ±30%).
Used for the r5 face-lite weight-layout A/B."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from jax import lax
from openfoam_tpp_tpu.ops.pallas import seven_point as sp

key = jax.random.PRNGKey(0)
shape = (112, 112, 112)
p = jax.random.normal(key, shape, jnp.float32) * 0.01
wx = jax.random.uniform(key, (113, 112, 112), jnp.float32) * 0.16
wy = jax.random.uniform(key, (112, 113, 112), jnp.float32) * 0.16
wz = jax.random.uniform(key, (112, 112, 113), jnp.float32) * 0.16
split = sp.split_weights(wx, wy, wz)
b = p + 1.0
split16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), split)
p16, b16 = p.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
N = 100

def chain(fn, x0, *args):
    @jax.jit
    def run(x):
        def body(x, _):
            return fn(x, *args), None
        x, _ = lax.scan(body, x, None, length=N)
        return x
    return run

def bench(name, run, x0, reps=7):
    r = run(x0); jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(x0); jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) / N)
    ts = np.array(ts) * 1e6
    print(f"{name:28s} {ts.min():7.1f} us (median {np.median(ts):7.1f})")

bench("apply_dot_7pt f32",
      chain(lambda x: sp.apply_dot_7pt(x, split)[0], p), p)
bench("resid_scaled_unit f32",
      chain(lambda x: sp.resid_scaled_7pt(x, split, None, b), p), p)
bench("cheb2_pre bf16",
      chain(lambda x: sp.cheb2_pre_7pt(x, split16, 1.9, 0.06)[0], b16), b16)
bench("cheb2_post_dot bf16",
      chain(lambda x: sp.cheb2_post_dot_7pt(x, b16, split16, 1.9, 0.06)[0].astype(jnp.bfloat16), p16), p16)
