"""HW: temporally-blocked banded kernel at 1080p/4K vs jnp."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

def bench(h, w, iters, backend, tag='', n=10, check=None, **kw):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend, **kw)
    try:
        t0 = time.perf_counter()
        f = hs_solve(i1, i2, cfg); float(jnp.sum(f.u))
        tc = time.perf_counter()-t0
    except Exception as e:
        print(f'{tag} {h}x{w} {backend}: FAIL {type(e).__name__}: {str(e)[:200]}', flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n): f = hs_solve(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter()-t0)/n
    print(f'{tag} {h}x{w} i{iters} {backend}{kw}: {dt*1e3:.2f} ms, {h*w*iters/dt/1e9:.1f} Gpx*sweep/s (compile {tc:.0f}s)', flush=True)
    if check is not None:
        print(f'  max|d| vs check = {float(jnp.abs(f.u-check.u).max()):.2e}', flush=True)
    return f

fj = bench(1088, 1920, 100, 'jnp', tag='1080p')
bench(1088, 1920, 100, 'pallas', tag='1080p-banded-s8', check=fj)
bench(1088, 1920, 100, 'pallas', tag='1080p-banded-s16', check=fj, block_sweeps=16)
fj4 = bench(2176, 3840, 100, 'jnp', tag='4k')
bench(2176, 3840, 100, 'pallas', tag='4k-banded-s8', check=fj4)
