"""HW: real solver at the video preset (low iters) — plain vs folded.

tools/hw_folded_ab.py measured folded 17% faster at i20/s10 with jnp
derivatives inline; this runs the REAL hs_solve path (Pallas derivative
prologue) to decide whether to auto-enable folding at low iteration
counts. Same-process A/B at i20 and i100.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import importlib
import jax, jax.numpy as jnp, numpy as np


def bench(fold_lanes, iters, s=0, n=20):
    os.environ["HSFLOW_FOLD_LANES"] = str(fold_lanes)
    import opticalflowhs_tpu.kernels.jacobi as jk
    importlib.reload(jk)
    import opticalflowhs_tpu.solver as sv
    importlib.reload(sv)
    from opticalflowhs_tpu.config import HSConfig
    h, w = 1088, 1920
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend="pallas", block_sweeps=s)
    tag = f"{'fold' if fold_lanes else 'plain'} i{iters} s{s}"
    try:
        f = sv.hs_solve(i1, i2, cfg)
        float(jnp.sum(f.u))
    except Exception as e:
        print(f"{tag}: FAIL {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        f = sv.hs_solve(i1, i2, cfg)
    jax.block_until_ready((f.u, f.v))
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:.3f} ms, {h*w*iters/dt/1e9:.2f} Gpx*sweeps/s, "
          f"{1/dt:.1f} fps", flush=True)


bench(0, 20)        # video preset, current default
bench(3840, 20)     # folded
bench(3840, 20, s=10)
bench(0, 100)       # sanity: folded must still lose here
bench(3840, 100)
print("DONE", flush=True)
