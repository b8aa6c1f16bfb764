"""HW: aligned-edge concat-shift optimization effect."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

def bench(h, w, iters, n=10):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend='pallas')
    f = hs_solve(i1, i2, cfg); float(jnp.sum(f.u))
    t0 = time.perf_counter()
    for _ in range(n): f = hs_solve(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter()-t0)/n
    fj = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=iters, backend='jnp'))
    d = float(jnp.abs(f.u-fj.u).max())
    print(f'{h}x{w} i{iters}: {dt*1e3:.2f} ms ({h*w*iters/dt/1e9:.1f} Gpx*sweep/s) maxd={d:.1e}', flush=True)

bench(1024, 1280, 100)   # fully aligned vmem: zero wheres
bench(1088, 1920, 100)   # banded: col wheres dropped
bench(512, 640, 100)     # aligned vmem small
