"""HW A/B: Pallas derivative kernel vs XLA prologue, at iters 20 and 100,
with the new band sizing — decides the precompute routing."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import importlib
import time
import jax, jax.numpy as jnp, numpy as np

def run(deriv_kernel, iters, h=1088, w=1920, n=15):
    os.environ["HSFLOW_DERIV_KERNEL"] = "1" if deriv_kernel else "0"
    from opticalflowhs_tpu.config import HSConfig
    from opticalflowhs_tpu import solver
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend="pallas")
    # env var is read at trace time -> fresh jit cache key needed: clear
    solver._hs_solve_impl.clear_cache()
    f = solver.hs_solve(i1, i2, cfg); float(jnp.sum(f.u))
    t0 = time.perf_counter()
    for _ in range(n): f = solver.hs_solve(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter()-t0)/n
    print(f"deriv_kernel={deriv_kernel} iters={iters}: {dt*1e3:.3f} ms, "
          f"{h*w*iters/dt/1e9:.2f} Gpx*sweeps/s", flush=True)
    return dt

for it in (100, 20):
    a = run(True, it)
    b = run(False, it)
    print(f"  -> kernel/XLA ratio at iters={it}: {a/b:.3f}", flush=True)
print("DONE", flush=True)
