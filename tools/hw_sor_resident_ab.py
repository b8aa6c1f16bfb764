"""HW A/B: VMEM-resident 4-color SOR whole-solve kernel vs the banded SOR
kernel (round-4 VERDICT item 1).

The banded path ran 0.161 ms/sweep at 1080p vs Jacobi-resident's ~0.023 —
a 7x per-sweep gap where the color count says 4x. The resident schedule
removes the banded kernel's per-launch field streaming, 4*s-row halo slabs,
redundant halo compute, and per-launch mask construction.

Legs, most important first (the helper can die mid-run):
 1. exactness on chip: resident SOR == jnp backend at 1080p i10
 2. 1080p i50 omega=1.71: resident whole-solve vs precompute+banded
    (n=30 steady-state chains — round-4 methodology)
 3. family-table re-run rows: SOR i50 resident vs Jacobi i400 resident
    time-to-EPE on the alpha=0.25 translation workload
 4. band-count probe nb in {3, 4}
Writes /tmp/hw_sor_resident_ab.json as it goes.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import opticalflowhs_tpu.kernels.solve_resident as sr
import opticalflowhs_tpu.kernels.sor as sork
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve, precompute
from opticalflowhs_tpu.metrics import epe, interior
from opticalflowhs_tpu.data.synthetic import translation_pair

OUT = "/tmp/hw_sor_resident_ab.json"
results = {}


def save():
    json.dump(results, open(OUT, "w"), indent=1)


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=30):
    out = fn()
    sync(out)  # deferred remote compile fires here
    fn()  # absorb the post-idle wake-up spike outside the chain
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def frames(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
    )


H, W = 1088, 1920
OMEGA = 1.71
i1, i2 = frames(H, W)
print(f"auto SOR geometry at {H}x{W}: "
      f"{sr.pick_geometry(H, W, jnp.float32, stages=4)}", flush=True)

# -- leg 1: exactness ---------------------------------------------------------
fp = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=10, solver="sor",
                               omega=OMEGA, backend="pallas"))
fj = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=10, solver="sor",
                               omega=OMEGA, backend="jnp"))
d = max(float(jnp.abs(fp.u - fj.u).max()), float(jnp.abs(fp.v - fj.v).max()))
print(f"exact 1080p i10: max|resident_sor - jnp| = {d}", flush=True)
results["exact_1080p_i10"] = d
save()

# -- leg 2: 1080p i50 resident vs banded --------------------------------------
cfgp = HSConfig(alpha=0.5, iters=50, solver="sor", omega=OMEGA,
                backend="pallas")
IT = 50


@jax.jit
def run_resident(a, b):
    return sr.hs_solve_resident_sor(a, b, 0.5, IT, OMEGA)


@jax.jit
def run_banded(a, b):
    ex, ey, et, invd = precompute(a, b, cfgp)
    u = jnp.zeros_like(ex)
    v = jnp.zeros_like(ex)
    return sork.sor_sweeps(u, v, ex, ey, et, invd, IT, OMEGA)


for name, fn in (("resident", run_resident), ("banded", run_banded)):
    t0 = time.perf_counter()
    dt = timeit(lambda: fn(i1, i2))
    print(f"1080p SOR i{IT} {name}: {dt*1e3:.3f} ms = "
          f"{H*W*IT/dt/1e9:.2f} Gpx*sweeps/s "
          f"(leg wall {time.perf_counter()-t0:.0f}s)", flush=True)
    results[f"1080p_i{IT}_{name}_ms"] = dt * 1e3
    save()
du = jnp.abs(run_resident(i1, i2)[0] - run_banded(i1, i2)[0]).max()
print(f"resident vs banded max|du| = {float(du)}", flush=True)
results["resident_vs_banded_maxdiff"] = float(du)
save()

# -- leg 3: family-table time-to-EPE rows -------------------------------------
t1, t2, gt = translation_pair(H, W, 0.7, -0.3, key=5)
t1, t2 = jnp.asarray(t1), jnp.asarray(t2)
gtc = interior(gt, 16)


def run_cfg(tag, cfg, n=30):
    fn = lambda: hs_solve(t1, t2, cfg)
    dt = timeit(fn, n)
    f = fn()
    fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
    e = float(epe(interior(fl, 16), gtc))
    print(f"tte {tag}: {dt*1e3:8.2f} ms  EPE {e:.6g}", flush=True)
    results[f"tte_{tag}"] = {"ms": dt * 1e3, "epe": e}
    save()


run_cfg("sor_i50_resident", HSConfig(alpha=0.25, iters=50, solver="sor",
                                     omega=OMEGA, backend="pallas"))
run_cfg("jacobi_i400_resident", HSConfig(alpha=0.25, iters=400,
                                         backend="pallas"))
run_cfg("jacobi_i100_resident", HSConfig(alpha=0.25, iters=100,
                                         backend="pallas"))

# -- leg 4: band-count probe --------------------------------------------------
for nb in (4,):
    sr._FORCE_NB = nb

    @jax.jit
    def run_nb(a, b):
        return sr.hs_solve_resident_sor(a, b, 0.5, IT, OMEGA)

    try:
        dt = timeit(lambda: run_nb(i1, i2))
        print(f"1080p SOR i{IT} resident nb={nb}: {dt*1e3:.3f} ms",
              flush=True)
        results[f"1080p_i{IT}_resident_nb{nb}_ms"] = dt * 1e3
    except Exception as e:
        print(f"nb={nb}: FAIL {str(e)[:200]}", flush=True)
        results[f"1080p_i{IT}_resident_nb{nb}_ms"] = str(e)[:200]
    save()
sr._FORCE_NB = 0
print("DONE", flush=True)
