"""HW A/B: VMEM-resident whole-solve kernel vs the fused pipeline vs classic.

Legs, most important first (the helper can die mid-run):
 1. exactness: resident == fused == jnp oracle at 1080p (auto nb)
 2. 1080p i100 timing: resident(auto) vs fused vs classic
 3. resident band-count probe at 1080p: nb in {2, 3, 4}
 4. 1024x1280 i100 (the current whole-VMEM class) resident vs classic
 5. shallow schedule 1080p i20
Writes /tmp/hw_resident_ab.json as it goes.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import opticalflowhs_tpu.kernels.solve_resident as sr
from opticalflowhs_tpu.kernels.solve_fused import hs_solve_fused
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

OUT = "/tmp/hw_resident_ab.json"
results = {}


def save():
    json.dump(results, open(OUT, "w"), indent=1)


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=10):
    out = fn()
    sync(out)  # deferred remote compile fires here
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

print(f"auto geometry at {H}x{W}: {sr.pick_geometry(H, W, jnp.float32)}",
      flush=True)

# -- leg 1: exactness ---------------------------------------------------------
res_fn = jax.jit(lambda a, b: sr.hs_solve_resident(a, b, 0.5, IT))
t_res = timeit(lambda: res_fn(i1, i2))
u_res, v_res = res_fn(i1, i2)
print(f"resident(auto) 1080p i100: {t_res*1e3:.3f} ms "
      f"({H*W*IT/t_res/1e9:.1f} Gpx*sweeps/s)", flush=True)
results["resident_auto_1080p_i100_ms"] = round(t_res * 1e3, 3)
save()

fus_fn = jax.jit(lambda a, b: hs_solve_fused(a, b, 0.5, IT))
t_fus = timeit(lambda: fus_fn(i1, i2))
u_fus, v_fus = fus_fn(i1, i2)
d = max(float(jnp.abs(u_res - u_fus).max()), float(jnp.abs(v_res - v_fus).max()))
print(f"fused 1080p i100: {t_fus*1e3:.3f} ms "
      f"({H*W*IT/t_fus/1e9:.1f}); |resident - fused| max = {d:.3e}", flush=True)
results["fused_1080p_i100_ms"] = round(t_fus * 1e3, 3)
results["resident_vs_fused_maxdiff"] = d
save()

cfgj = HSConfig(alpha=0.5, iters=IT, backend="jnp")
fj = hs_solve(i1, i2, cfgj)
dj = max(float(jnp.abs(u_res - fj.u).max()), float(jnp.abs(v_res - fj.v).max()))
print(f"|resident - jnp oracle| max = {dj:.3e}", flush=True)
results["resident_vs_jnp_maxdiff"] = dj
save()

# -- leg 3: band-count probe --------------------------------------------------
for nb in (2, 3, 4, 6):
    sr._FORCE_NB = nb
    g = sr.pick_geometry(H, W, jnp.float32)
    try:
        fn = jax.jit(lambda a, b, _nb=nb: sr.hs_solve_resident(a, b, 0.5, IT))
        t = timeit(lambda: fn(i1, i2))
        uu, vv = fn(i1, i2)
        dd = max(float(jnp.abs(uu - u_fus).max()),
                 float(jnp.abs(vv - v_fus).max()))
        print(f"resident nb={nb} (geom {g}): {t*1e3:.3f} ms "
              f"({H*W*IT/t/1e9:.1f} Gpx*sweeps/s) maxdiff={dd:.2e}", flush=True)
        results[f"resident_nb{nb}_1080p_i100_ms"] = round(t * 1e3, 3)
    except Exception as e:  # VMEM OOM -> helper 500
        print(f"resident nb={nb}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        results[f"resident_nb{nb}_1080p_i100_ms"] = None
    save()
sr._FORCE_NB = 0

# -- leg 4: 1024x1280 (whole-VMEM class today) --------------------------------
j1, j2 = frames(1024, 1280, seed=1)
fn = jax.jit(lambda a, b: sr.hs_solve_resident(a, b, 0.5, IT))
t = timeit(lambda: fn(j1, j2))
print(f"resident 1024x1280 i100: {t*1e3:.3f} ms "
      f"({1024*1280*IT/t/1e9:.1f} Gpx*sweeps/s)", flush=True)
results["resident_1024x1280_i100_ms"] = round(t * 1e3, 3)
save()

os.environ["HSFLOW_RESIDENT_SOLVE"] = "0"
os.environ["HSFLOW_FUSED_SOLVE"] = "0"
cfgp = HSConfig(alpha=0.5, iters=IT, backend="pallas")
t = timeit(lambda: hs_solve(j1, j2, cfgp))
print(f"classic(vmem path) 1024x1280 i100: {t*1e3:.3f} ms "
      f"({1024*1280*IT/t/1e9:.1f})", flush=True)
results["classic_1024x1280_i100_ms"] = round(t * 1e3, 3)

t = timeit(lambda: hs_solve(i1, i2, cfgp))
print(f"classic(banded) 1080p i100: {t*1e3:.3f} ms ({H*W*IT/t/1e9:.1f})",
      flush=True)
results["classic_1080p_i100_ms"] = round(t * 1e3, 3)
save()

# -- leg 5: shallow schedule --------------------------------------------------
fn20r = jax.jit(lambda a, b: sr.hs_solve_resident(a, b, 0.5, 20))
t = timeit(lambda: fn20r(i1, i2))
print(f"resident 1080p i20: {t*1e3:.3f} ms ({H*W*20/t/1e9:.1f})", flush=True)
results["resident_1080p_i20_ms"] = round(t * 1e3, 3)
fn20f = jax.jit(lambda a, b: hs_solve_fused(a, b, 0.5, 20, s_cap=0))
out = fn20f(i1, i2)
if out is None:
    print("fused i20: no geometry", flush=True)
else:
    t = timeit(lambda: fn20f(i1, i2))
    print(f"fused 1080p i20: {t*1e3:.3f} ms ({H*W*20/t/1e9:.1f})", flush=True)
    results["fused_1080p_i20_ms"] = round(t * 1e3, 3)
save()
print("DONE", flush=True)
