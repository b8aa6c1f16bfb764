"""HW: batched stacked kernel throughput (config 2/4 video workloads)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.batch import hs_solve_batched

def bench(b, h, w, iters, backend, n=10):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(b,h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(b,h,w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend)
    try:
        f = hs_solve_batched(i1, i2, cfg); float(jnp.sum(f.u))
    except Exception as e:
        print(f'B{b} {h}x{w} {backend}: FAIL {type(e).__name__}: {str(e)[:150]}', flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): f = hs_solve_batched(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter()-t0)/n
    print(f'B{b} {h}x{w} i{iters} {backend}: {dt*1e3:.2f} ms, {b*h*w*iters/dt/1e9:.1f} Gpx*sweep/s, {b/dt:.0f} fps', flush=True)

bench(8, 512, 640, 100, 'pallas')
bench(8, 512, 640, 100, 'jnp')
bench(16, 240, 320, 100, 'pallas')
bench(16, 240, 320, 100, 'jnp')
bench(4, 720, 1280, 100, 'pallas')
