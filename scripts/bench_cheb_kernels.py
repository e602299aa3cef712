"""Micro-bench: achieved HBM bandwidth of the 4-step fused DS cheb kernel
at the 1M north-star shape. Decides whether an 8-step kernel is worth it."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from feastkit_tpu.ops.cheb_pallas import (cheb_plan, cheb_ds4_chunk,
                                          cheb_ds2_chunk)

nx = 1024
N = nx * nx
M = 72
offsets = (-nx, -1, 0, 1, nx)
plan = cheb_plan(offsets, N, M, margin=4)
print("plan:", {k: plan[k] for k in ("block", "n_blocks", "N_tot", "Mp")})

Mp, N_tot = plan["Mp"], plan["N_tot"]
nd = len(offsets)
key = jax.random.PRNGKey(0)
mk = lambda shape: jax.random.normal(key, shape, jnp.float32) * 1e-3
dgh = mk((nd, N_tot))
dgl = jnp.zeros((nd, N_tot), jnp.float32)
t0h, t1h, ach = mk((Mp, N_tot)), mk((Mp, N_tot)), mk((Mp, N_tot))
zeros = jnp.zeros((Mp, N_tot), jnp.float32)
carry = (t0h, zeros, t1h, zeros, ach, zeros)

STEPS = 64
coeffs = jnp.asarray(np.random.rand(STEPS), jnp.float32)
sc, sh = 0.5, 0.25

f4 = jax.jit(lambda c: cheb_ds4_chunk(dgh, dgl, c, coeffs, sc, sh,
                                      plan=plan))
out = f4(carry)
jax.block_until_ready(out)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = f4(carry)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
dt = min(ts)
passes = STEPS // 4
plane = Mp * N_tot * 4
diag = nd * N_tot * 4
bytes_pass = 12 * plane + 8 * diag
gbs = passes * bytes_pass / dt / 1e9
print(f"ds4: {dt*1e3:.1f} ms for {STEPS} steps -> "
      f"{dt/STEPS*1e3:.2f} ms/step, actual {gbs:.0f} GB/s "
      f"(v5e peak ~819)")

# ds2 comparison at margin>=2 (same margin-4 plan works)
f2 = jax.jit(lambda c: cheb_ds2_chunk(dgh, dgl, c, coeffs, sc, sh,
                                      plan=plan))
out = f2(carry)
jax.block_until_ready(out)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = f2(carry)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
dt2 = min(ts)
passes2 = STEPS // 2
bytes_pass2 = 12 * plane + 4 * diag
gbs2 = passes2 * bytes_pass2 / dt2 / 1e9
print(f"ds2: {dt2*1e3:.1f} ms for {STEPS} steps -> "
      f"{dt2/STEPS*1e3:.2f} ms/step, actual {gbs2:.0f} GB/s; "
      f"ds4 speedup {dt2/dt:.2f}x")

# f32 kernels
from feastkit_tpu.ops.cheb_pallas import cheb_f32_4_chunk, cheb_f32_2_chunk
carry32 = (t0h, t1h, ach)
for name, fn, sdiv in (("f32x4", cheb_f32_4_chunk, 4),
                       ("f32x2", cheb_f32_2_chunk, 2)):
    f = jax.jit(lambda c, fn=fn: fn(dgh, c, coeffs, sc, sh, plan=plan))
    out = f(carry32)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(carry32)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    passes = STEPS // sdiv
    bytes_pass = 6 * plane + sdiv * diag
    print(f"{name}: {dt*1e3:.1f} ms for {STEPS} steps -> "
          f"{dt/STEPS*1e3:.2f} ms/step, actual "
          f"{passes*bytes_pass/dt/1e9:.0f} GB/s")
