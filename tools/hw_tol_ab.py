"""HW: solve-to-tolerance A/B on the real chip.

Legs:
 1. overhead: fixed-iters vs tol-with-unreachable-tol at the SAME sweep
    count (the while_loop + per-block masked max + cond is the only delta)
    at several check cadences — the cost of the convergence test.
 2. time-to-EPE: tol runs vs hand-tuned fixed budgets at 1080p. The pitch:
    tol reaches the converged EPE without knowing the magic iteration
    count, for a small overhead.
 3. exactness: pallas tol == jnp tol on hardware (while_loop wraps the
    banded kernel; block boundaries identical by construction).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve
from opticalflowhs_tpu.metrics import epe, interior
from opticalflowhs_tpu.data.synthetic import translation_pair


def timeit(fn, n=10):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def overhead(h=1088, w=1920, iters=400, n=5):
    """Per-cadence A/B: the fixed baseline is re-timed at the SAME
    block_sweeps as each tol leg, so kernel banding and launch count are
    held constant and the printed delta isolates the convergence test
    (while_loop + per-block masked max + cond)."""
    i1, i2, _ = translation_pair(h, w, 1.0, 0.0, key=3)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    for b in (16, 50, 100):
        base = timeit(lambda: hs_solve(
            i1, i2, HSConfig(alpha=0.1, iters=iters, block_sweeps=b,
                             backend="pallas")), n)
        cfg = HSConfig(alpha=0.1, iters=iters, tol=1e-30, block_sweeps=b,
                       backend="pallas")
        dt = timeit(lambda: hs_solve(i1, i2, cfg), n)
        print(f"ovh b{b:4d} i{iters}: fixed {base*1e3:8.2f} ms  "
              f"tol {dt*1e3:8.2f} ms  (+{(dt/base-1)*100:.1f}%)", flush=True)


def time_to_epe(h=1088, w=1920, n=5):
    i1, i2, gt = translation_pair(h, w, 1.0, 0.0, key=3)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    gtc = interior(gt, 8)

    def run(label, cfg):
        fn = lambda: hs_solve(i1, i2, cfg)
        dt = timeit(fn, n)
        f = fn()
        fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
        e = epe(interior(fl, 8), gtc)
        print(f"tte {label:22s}: {dt*1e3:8.2f} ms  EPE {e:.6g}", flush=True)

    run("jacobi fixed-800", HSConfig(alpha=0.1, iters=800, backend="pallas"))
    for tol in (1e-3, 3e-4, 1e-4):
        run(f"jacobi tol={tol:g} b=50",
            HSConfig(alpha=0.1, iters=2000, tol=tol, block_sweeps=50,
                     backend="pallas"))
    run("sor fixed-100",
        HSConfig(alpha=0.1, iters=100, solver="sor", omega=1.5,
                 backend="pallas"))
    for tol in (1e-3, 3e-4):
        run(f"sor tol={tol:g} b=16",
            HSConfig(alpha=0.1, iters=400, tol=tol, solver="sor", omega=1.5,
                     block_sweeps=16, backend="pallas"))


def exactness(h=512, w=640, tol=1e-3):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    cfg = dict(alpha=0.5, iters=256, tol=tol, block_sweeps=16)
    fp = hs_solve(i1, i2, HSConfig(backend="pallas", **cfg))
    fj = hs_solve(i1, i2, HSConfig(backend="jnp", **cfg))
    d = max(float(jnp.abs(fp.u - fj.u).max()),
            float(jnp.abs(fp.v - fj.v).max()))
    print(f"exact tol {h}x{w}: max|pallas-jnp| = {d}", flush=True)


exactness()
overhead()
time_to_epe()
print("DONE", flush=True)
