"""Hardware validation + throughput of the production kernels (post-rewrite)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

def bench(h, w, iters, backend, tag='', n=10, **cfgkw):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend, **cfgkw)
    try:
        t0 = time.perf_counter()
        f = hs_solve(i1, i2, cfg); float(jnp.sum(f.u))
        tc = time.perf_counter()-t0
    except Exception as e:
        print(f'{tag} {h}x{w} {backend}: FAIL {type(e).__name__}: {str(e)[:120]}', flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n): f = hs_solve(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter()-t0)/n
    print(f'{tag} {h}x{w} i{iters} {backend}: {dt*1e3:.2f} ms, {h*w*iters/dt/1e9:.1f} Gpx*sweep/s (compile {tc:.0f}s)', flush=True)
    return f

# correctness on HW: pallas vs jnp both paths
for (h, w) in [(64, 80), (300, 140)]:
    fp = bench(h, w, 32, 'pallas', tag='corr')
    fj = bench(h, w, 32, 'jnp', tag='corr')
    if fp is not None and fj is not None:
        print(f'  {h}x{w} max|d| = {float(jnp.abs(fp.u-fj.u).max()):.2e}', flush=True)

bench(1024, 1280, 100, 'pallas', tag='vmem')
bench(1088, 1920, 100, 'pallas', tag='1080p-banded')   # banded auto s=8
fj = bench(1088, 1920, 100, 'jnp', tag='1080p')
