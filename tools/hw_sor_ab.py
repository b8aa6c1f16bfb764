"""HW: SOR solver A/B vs Jacobi — exactness, per-sweep cost, time-to-EPE.

Legs:
 1. exactness: VMEM-class (512x640) and banded HD (1088x1920) SOR kernel
    vs the jnp oracle on the real chip.
 2. per-sweep throughput of the SOR kernels (Gpx*sweeps/s; expect ~1/4 of
    Jacobi's — each sweep is 4 color stages).
 3. time-to-EPE at 1080p, alpha=0.1, 1 px translation: wall time for
    Jacobi-800 vs SOR-{50,100,200} at omega {1.5, 1.8, 1.95} to reach the
    converged EPE. The headline claim: SOR wins wall-clock by ~2x.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.ops import stencils
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


def exactness(h, w, iters=9, omega=1.8):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    cfg = dict(alpha=0.5, iters=iters, solver="sor", omega=omega)
    fp = hs_solve(i1, i2, HSConfig(backend="pallas", **cfg))
    fj = hs_solve(i1, i2, HSConfig(backend="jnp", **cfg))
    d = max(float(jnp.abs(fp.u - fj.u).max()), float(jnp.abs(fp.v - fj.v).max()))
    print(f"exact {h}x{w} i{iters}: max|pallas-jnp| = {d}", flush=True)


def throughput(h, w, iters=100, n=10):
    rng = np.random.default_rng(1)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    for solver in ("jacobi", "sor"):
        fn = lambda: hs_solve(i1, i2, HSConfig(alpha=0.5, iters=iters,
                                               solver=solver, omega=1.8,
                                               backend="pallas"))
        try:
            dt = timeit(fn, n)
        except Exception as e:
            print(f"tput {solver} {h}x{w}: FAIL {str(e)[:200]}", flush=True)
            continue
        print(f"tput {solver} {h}x{w} i{iters}: {dt*1e3:.3f} ms = "
              f"{h*w*iters/dt/1e9:.2f} Gpx*sweeps/s", flush=True)


def time_to_epe(h=1088, w=1920, n=5):
    i1, i2, gt = translation_pair(h, w, 1.0, 0.0, key=3)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    gtc = interior(gt, 8)

    def run(solver, iters, omega=1.5):
        cfg = HSConfig(alpha=0.1, iters=iters, solver=solver, omega=omega,
                       backend="pallas")
        fn = lambda: hs_solve(i1, i2, cfg)
        dt = timeit(fn, n)
        f = fn()
        fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
        e = epe(interior(fl, 8), gtc)
        print(f"tte {solver:6s} i{iters:4d} om{omega:.2f}: {dt*1e3:8.2f} ms  "
              f"EPE {e:.6g}", flush=True)
        return dt, e

    run("jacobi", 800)
    run("jacobi", 400)
    run("jacobi", 200)
    for om in (1.5, 1.8, 1.9, 1.95):
        run("sor", 50, om)
        run("sor", 100, om)
    run("sor", 200, 1.95)
    # multigrid (jnp/XLA path; iters = V-cycles) — the stiff-regime lever,
    # timed here at alpha=0.1 for same-problem comparability.
    for cyc in (2, 3, 5):
        try:
            run("multigrid", cyc)
        except Exception as e:
            print(f"tte multigrid c{cyc}: FAIL {str(e)[:200]}", flush=True)


def time_to_epe_alpha1(h=1088, w=1920, n=5):
    """The regime multigrid exists for: alpha=1, where Jacobi/SOR crawl."""
    i1, i2, gt = translation_pair(h, w, 1.0, 0.0, key=4)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    gtc = interior(gt, 8)

    def run(solver, iters, omega=1.5, backend="pallas"):
        cfg = HSConfig(alpha=1.0, iters=iters, solver=solver, omega=omega,
                       backend=backend)
        fn = lambda: hs_solve(i1, i2, cfg)
        dt = timeit(fn, n)
        f = fn()
        fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
        e = epe(interior(fl, 8), gtc)
        print(f"tteA1 {solver:9s} i{iters:4d}: {dt*1e3:8.2f} ms  "
              f"EPE {e:.6g}", flush=True)

    run("jacobi", 1600)
    run("jacobi", 100)
    run("sor", 400)
    for cyc in (2, 3, 5):
        try:
            run("multigrid", cyc, backend="jnp")
        except Exception as e:
            print(f"tteA1 multigrid c{cyc}: FAIL {str(e)[:200]}", flush=True)


exactness(512, 640)          # VMEM-class kernel
exactness(1088, 1920, iters=5)  # banded HD kernel
throughput(512, 640)
throughput(1088, 1920)
time_to_epe()
time_to_epe_alpha1()
print("DONE", flush=True)
