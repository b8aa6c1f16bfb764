"""HW: round-2 feature validation on the real chip.

Legs:
 1. tune_omega: power-loop compiles, returns a sane omega, and the tuned
    SOR run beats the 1.9 default at a fixed sweep budget (1080p).
 2. tiled multigrid (degenerate 1x1 mesh — same GSPMD code path as a
    pod): == untiled multigrid.
 3. occlusion pipeline: batch-2 bidirectional solve + fb mask on a
    synthetic pan (expect ~0% flagged), through the Pallas kernels.
 4. solve-to-tolerance on the banded kernel path at 1080p (also covered
    by hw_tol_ab; here just an exactness spot-check vs jnp).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.config import HSConfig, MeshConfig
from opticalflowhs_tpu.data.synthetic import translation_pair
from opticalflowhs_tpu.metrics import epe, interior
from opticalflowhs_tpu.solver import hs_solve, tune_omega


def timeit(fn, n=5):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def leg_tune_omega(h=1088, w=1920):
    i1, i2, gt = translation_pair(h, w, 1.0, 0.0, key=3)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    t0 = time.perf_counter()
    om = tune_omega(i1, i2, HSConfig(alpha=0.1))
    print(f"tune_omega(alpha=0.1) = {om} in {time.perf_counter()-t0:.1f}s "
          f"(incl. compile)", flush=True)
    gtc = interior(gt, 8)
    for w_ in (om, 1.9):
        cfg = HSConfig(alpha=0.1, iters=60, solver="sor", omega=w_,
                       backend="pallas")
        dt = timeit(lambda: hs_solve(i1, i2, cfg))
        f = hs_solve(i1, i2, cfg)
        fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
        print(f"  sor om={w_}: {dt*1e3:7.2f} ms  "
              f"EPE {epe(interior(fl, 8), gtc):.6g}", flush=True)


def leg_tiled_multigrid(h=544, w=960):
    from opticalflowhs_tpu.dist import hs_solve_tiled, make_mesh

    i1, i2, _ = translation_pair(h, w, 1.0, 0.0, key=4)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    mesh = make_mesh(MeshConfig(batch=1, y=1, x=1))
    cfg = HSConfig(alpha=1.0, iters=3, solver="multigrid", backend="jnp")
    ft = hs_solve_tiled(i1, i2, cfg, mesh=mesh)
    fu = hs_solve(i1, i2, cfg)
    d = max(float(jnp.abs(ft.u - fu.u).max()),
            float(jnp.abs(ft.v - fu.v).max()))
    print(f"tiled multigrid (1x1 GSPMD) vs untiled: max diff {d}", flush=True)


def leg_occlusion(h=544, w=960):
    from opticalflowhs_tpu.consistency import flow_with_occlusion

    i1, i2, _ = translation_pair(h, w, 1.0, 0.0, key=5)
    flow, occ = flow_with_occlusion(
        jnp.asarray(i1), jnp.asarray(i2),
        HSConfig(alpha=0.1, iters=200, backend="pallas"),
    )
    frac = float(jnp.mean(occ))
    print(f"occlusion pan: {100*frac:.2f}% flagged (expect ~0), "
          f"mean u {float(jnp.mean(flow.u)):+.3f} (true +1)", flush=True)


def leg_tol_exact(h=512, w=640):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    cfg = dict(alpha=0.5, iters=200, tol=1e-3, block_sweeps=16)
    fp = hs_solve(i1, i2, HSConfig(backend="pallas", **cfg))
    fj = hs_solve(i1, i2, HSConfig(backend="jnp", **cfg))
    d = max(float(jnp.abs(fp.u - fj.u).max()),
            float(jnp.abs(fp.v - fj.v).max()))
    print(f"tol pallas==jnp: max diff {d}", flush=True)


for leg in (leg_tol_exact, leg_tune_omega, leg_tiled_multigrid, leg_occlusion):
    try:
        leg()
    except Exception as e:
        print(f"{leg.__name__}: FAIL {str(e)[:300]}", flush=True)
print("DONE", flush=True)
