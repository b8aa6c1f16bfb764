"""HW probe: temporally-blocked resident kernel — block depth x band count.

Grid at 1080p i100 (exactness vs the fused pipeline asserted per leg),
then the best config at i20 and 1024x1280. Writes /tmp/hw_resident_s.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import opticalflowhs_tpu.kernels.solve_resident as sr
from opticalflowhs_tpu.kernels.solve_fused import hs_solve_fused

OUT = "/tmp/hw_resident_s.json"
results = {}


def save():
    json.dump(results, open(OUT, "w"), indent=1)


def timeit(fn, n=10):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
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


H, W, IT = 1088, 1920, 100
i1, i2 = frames(H, W)

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

fj = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=IT, backend="jnp"))
u_ref, v_ref = fj.u, fj.v
float(jnp.sum(u_ref))
print("jnp reference ready", flush=True)

for nb, s in ((2, 8), (2, 16), (2, 4)):
    sr._FORCE_NB = nb
    sr._BLOCK_S = s
    g = sr.pick_geometry(H, W, jnp.float32)
    try:
        fn = jax.jit(lambda a, b, _k=(nb, s): sr.hs_solve_resident(
            a, b, 0.5, IT))
        t = timeit(lambda: fn(i1, i2))
        uu, vv = fn(i1, i2)
        dd = max(float(jnp.abs(uu - u_ref).max()),
                 float(jnp.abs(vv - v_ref).max()))
        print(f"nb={nb} s={s} (geom {g}): {t*1e3:.3f} ms "
              f"({H*W*IT/t/1e9:.1f} Gpx*sweeps/s) maxdiff={dd:.2e}",
              flush=True)
        results[f"nb{nb}_s{s}_ms"] = round(t * 1e3, 3)
        results[f"nb{nb}_s{s}_maxdiff"] = dd
    except Exception as e:
        print(f"nb={nb} s={s}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        results[f"nb{nb}_s{s}_ms"] = None
    save()

# best config, shallow schedule + the 1024x1280 class
best = min((v, k) for k, v in results.items()
           if k.endswith("_ms") and v is not None)
print(f"best: {best[1]} = {best[0]} ms", flush=True)
nb, s = int(best[1].split("_")[0][2:]), int(best[1].split("_")[1][1:])
sr._FORCE_NB = nb
sr._BLOCK_S = s
fn20 = jax.jit(lambda a, b: sr.hs_solve_resident(a, b, 0.5, 20))
t = timeit(lambda: fn20(i1, i2))
print(f"resident nb={nb} s={s} 1080p i20: {t*1e3:.3f} ms "
      f"({H*W*20/t/1e9:.1f})", flush=True)
results["best_1080p_i20_ms"] = round(t * 1e3, 3)
save()

sr._FORCE_NB = 0
j1, j2 = frames(1024, 1280, seed=1)
fnj = jax.jit(lambda a, b: sr.hs_solve_resident(a, b, 0.5, IT))
t = timeit(lambda: fnj(j1, j2))
g = sr.pick_geometry(1024, 1280, jnp.float32)
print(f"resident auto {g} 1024x1280 i100: {t*1e3:.3f} ms "
      f"({1024*1280*IT/t/1e9:.1f})", flush=True)
results["auto_1024x1280_i100_ms"] = round(t * 1e3, 3)
save()
print("DONE", flush=True)
