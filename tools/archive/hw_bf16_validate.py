"""HW: bf16 kernel correctness + throughput after the concat-shift fix."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

rng = np.random.default_rng(0)
for (h, w, it) in [(256, 384, 50), (1024, 1280, 100), (1088, 1920, 100)]:
    i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    try:
        cfgp = HSConfig(alpha=0.5, iters=it, backend='pallas', dtype='bfloat16')
        f = hs_solve(i1, i2, cfgp); float(jnp.sum(f.u.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(10): f = hs_solve(i1, i2, cfgp)
        jax.block_until_ready(f)
        dt = (time.perf_counter()-t0)/10
        fj = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=it, backend='jnp', dtype='bfloat16'))
        d = float(jnp.abs(f.u.astype(jnp.float32)-fj.u.astype(jnp.float32)).max())
        print(f'bf16 {h}x{w} i{it}: {dt*1e3:.2f} ms ({h*w*it/dt/1e9:.1f} Gpx*sweep/s) maxd_vs_jnp={d:.2e}', flush=True)
    except Exception as e:
        print(f'bf16 {h}x{w}: FAIL {type(e).__name__} {str(e)[:140]}', flush=True)
