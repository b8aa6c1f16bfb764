"""HW: batched banded kernel (round 2) — b2/b4 x 1080p and b2 x 4K through
the (B, n_bands)-grid temporally-blocked kernel; VERDICT item 3 target:
b4 x 1080p >= 34 Gpx*sweeps/s (parity with single-frame banded)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.batch import hs_solve_batched
from opticalflowhs_tpu.solver import hs_solve

def bench(b, h, w, iters, backend, n=10):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(b,h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(b,h,w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend)
    try:
        f = hs_solve_batched(i1, i2, cfg); float(jnp.sum(f.u))
    except Exception as e:
        print(f'B{b} {h}x{w} {backend}: FAIL {type(e).__name__}: {str(e)[:200]}', flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): f = hs_solve_batched(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter()-t0)/n
    print(f'B{b} {h}x{w} i{iters} {backend}: {dt*1e3:.2f} ms, {b*h*w*iters/dt/1e9:.2f} Gpx*sweep/s, {b/dt:.1f} fps', flush=True)

def check_exact(b, h, w):
    rng = np.random.default_rng(1)
    i1 = jnp.asarray(rng.uniform(0,1,(b,h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(b,h,w)).astype(np.float32))
    fp = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=20, backend="pallas"))
    d = 0.0
    for k in range(b):
        fj = hs_solve(i1[k], i2[k], HSConfig(alpha=0.5, iters=20, backend="jnp"))
        d = max(d, float(jnp.abs(fp.u[k]-fj.u).max()), float(jnp.abs(fp.v[k]-fj.v).max()))
    print(f'batched-banded vs per-image jnp max diff (B{b} {h}x{w}): {d}', flush=True)

check_exact(2, 1088, 1920)
bench(2, 1088, 1920, 100, 'pallas')
bench(4, 1088, 1920, 100, 'pallas')
bench(2, 2176, 3840, 100, 'pallas', n=5)
bench(4, 736, 1280, 100, 'pallas')
