"""HW A/B (round 5): plane-compressed SOR kernel vs the where-blend
resident SOR kernel at 1080p — the ~4.3x-vs-1.2x op-count argument,
measured. Legs: exactness (vs jnp backend via the solver route is covered
by hw_sor_resident_ab; here direct kernel-vs-kernel), i50 timing, i100
timing, and the time-to-EPE row on the family workload.
Writes /tmp/hw_sor_planes_ab.json as it goes."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import opticalflowhs_tpu.kernels.solve_resident as sr
import opticalflowhs_tpu.kernels.sor_planes as sp
from opticalflowhs_tpu.data.synthetic import translation_pair
from opticalflowhs_tpu.metrics import epe, interior

OUT = "/tmp/hw_sor_planes_ab.json"
results = {}


def save():
    json.dump(results, open(OUT, "w"), indent=1)


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=30):
    out = fn()
    sync(out)
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


H, W = 1088, 1920
OMEGA = 1.71
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

for IT in (50, 100):
    @jax.jit
    def run_planes(a, b, n=IT):
        return sp.hs_solve_sor_planes(a, b, 0.5, n, OMEGA)

    @jax.jit
    def run_blend(a, b, n=IT):
        return sr.hs_solve_resident_sor(a, b, 0.5, n, OMEGA)

    for name, fn in (("planes", run_planes), ("blend", run_blend)):
        t0 = time.perf_counter()
        dt = timeit(lambda: fn(i1, i2))
        print(f"1080p SOR i{IT} {name}: {dt*1e3:.3f} ms = "
              f"{H*W*IT/dt/1e9:.2f} Gpx*sweeps/s "
              f"(leg wall {time.perf_counter()-t0:.0f}s)", flush=True)
        results[f"i{IT}_{name}_ms"] = dt * 1e3
        save()
    d = jnp.abs(run_planes(i1, i2)[0] - run_blend(i1, i2)[0]).max()
    print(f"i{IT} planes vs blend max|du| = {float(d)}", flush=True)
    results[f"i{IT}_maxdiff"] = float(d)
    save()

# time-to-EPE on the family workload (alpha=0.25, (0.7,-0.3) translation)
t1, t2, gt = translation_pair(H, W, 0.7, -0.3, key=5)
t1, t2 = jnp.asarray(t1), jnp.asarray(t2)
gtc = interior(gt, 16)


@jax.jit
def run_tte(a, b):
    return sp.hs_solve_sor_planes(a, b, 0.25, 50, OMEGA)


dt = timeit(lambda: run_tte(t1, t2))
u, v = run_tte(t1, t2)
fl = np.stack([np.asarray(u), np.asarray(v)], -1)
e = float(epe(interior(fl, 16), gtc))
print(f"tte sor_i50_planes: {dt*1e3:.2f} ms  EPE {e:.6g}", flush=True)
results["tte_sor_i50_planes"] = {"ms": dt * 1e3, "epe": e}
save()
print("DONE", flush=True)
