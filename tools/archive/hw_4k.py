"""HW: 4K banded after band auto-sizing + vmem limit."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

def bench(h, w, iters, backend, tag='', n=5, check=None, **kw):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend, **kw)
    try:
        t0 = time.perf_counter()
        f = hs_solve(i1, i2, cfg); float(jnp.sum(f.u))
        tc = time.perf_counter()-t0
    except Exception as e:
        print(f'{tag} {h}x{w} {backend}: FAIL {type(e).__name__}: {str(e)[:160]}', flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n): f = hs_solve(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter()-t0)/n
    print(f'{tag} {h}x{w} i{iters} {backend}{kw}: {dt*1e3:.2f} ms, {h*w*iters/dt/1e9:.1f} Gpx*sweep/s (compile {tc:.0f}s)', flush=True)
    if check is not None:
        print(f'  max|d| vs jnp = {float(jnp.abs(f.u-check.u).max()):.2e}', flush=True)
    return f

fj4 = bench(2176, 3840, 40, 'jnp', tag='4k-ref')
bench(2176, 3840, 100, 'pallas', tag='4k-banded-auto')
f2 = bench(2176, 3840, 40, 'pallas', tag='4k-banded-check')
if fj4 is not None and f2 is not None:
    print(f'4k max|d| = {float(jnp.abs(f2.u-fj4.u).max()):.2e}', flush=True)
# 8k stretch
bench(4352, 7680, 50, 'pallas', tag='8k-banded')
