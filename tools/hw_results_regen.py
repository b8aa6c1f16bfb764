"""Regenerate RESULTS_HW.json from the CURRENT kernels. One measurement
methodology for every row (round-4 re-baseline, VERDICT item 2):
readback-synced warmup, then a LONG unsynced call chain under one final
block_until_ready — the round-3 profiling showed the first call after any
idle gap pays a ~25 ms axon-tunnel wake-up spike, which short loops smear
into every reading (docs/PERFORMANCE.md). n = 50 calls for fast rows so
the spike contributes < 0.5 ms/call of bias; slow rows use fewer calls
but are individually far larger than the spike.
Run on the real TPU: python tools/hw_results_regen.py"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig, MeshConfig, PyramidConfig
from opticalflowhs_tpu.batch import hs_solve_batched
from opticalflowhs_tpu.pyramid import hs_pyramid
from opticalflowhs_tpu.solver import hs_solve

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "RESULTS_HW.json")
results = {"device": str(jax.devices()[0].device_kind),
           "methodology": "readback-synced warmup, then mean over an n=50 "
                          "unsynced call chain (steady-state; amortizes the "
                          "~25 ms tunnel wake-up spike out of the reading) "
                          "(tools/hw_results_regen.py)"}

def pair(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, h, w) if b else (h, w)
    return (jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32)))

def timeit(fn, n=50):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

def solve_row(key, b, h, w, iters, backend, n=50):
    i1, i2 = pair(b, h, w)
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend)
    fn = (lambda: hs_solve_batched(i1, i2, cfg)) if b else (lambda: hs_solve(i1, i2, cfg))
    dt = timeit(fn, n)
    px = (b or 1) * h * w
    results[key] = {"ms": round(dt*1e3, 2),
                    "gpx_sweeps_s": round(px*iters/dt/1e9, 2),
                    "fps": round((b or 1)/dt, 1)}
    print(key, results[key], flush=True)

def exact_row(key, h, w, iters=20):
    i1, i2 = pair(0, h, w, seed=1)
    fp = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=iters, backend="pallas"))
    fj = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=iters, backend="jnp"))
    results[key] = max(float(jnp.abs(fp.u-fj.u).max()), float(jnp.abs(fp.v-fj.v).max()))
    print(key, results[key], flush=True)

exact_row("1080p_exactness", 1088, 1920)
solve_row("1024x1280_pallas_i100", 0, 1024, 1280, 100, "pallas")
solve_row("1080p_pallas_i100", 0, 1088, 1920, 100, "pallas")
solve_row("1080p_jnp_i100", 0, 1088, 1920, 100, "jnp")
exact_row("4k_exactness", 2176, 3840)
solve_row("4k_pallas_i100", 0, 2176, 3840, 100, "pallas")
solve_row("4k_jnp_i100", 0, 2176, 3840, 100, "jnp", n=10)
solve_row("8k_pallas_i50", 0, 4352, 7680, 50, "pallas", n=20)
solve_row("b8_512x640_pallas", 8, 512, 640, 100, "pallas")
solve_row("b16_240x320_pallas", 16, 240, 320, 100, "pallas")
solve_row("b4_720p_pallas", 4, 736, 1280, 100, "pallas")
solve_row("b2_1080p_pallas", 2, 1088, 1920, 100, "pallas")
solve_row("b4_1080p_pallas", 4, 1088, 1920, 100, "pallas")
solve_row("b2_4k_pallas", 2, 2176, 3840, 100, "pallas", n=20)

# 3-level pyramid, 1080p
i1, i2 = pair(0, 1088, 1920, seed=2)
cfg = HSConfig(alpha=0.5, iters=100, backend="pallas")
pyr = PyramidConfig(levels=3)
dt = timeit(lambda: hs_pyramid(i1, i2, cfg, pyr))
results["1080p_pyramid3_pallas"] = {"ms": round(dt*1e3, 2), "fps": round(1/dt, 1)}
print("1080p_pyramid3_pallas", results["1080p_pyramid3_pallas"], flush=True)

# 4K 3-level sharded pyramid on the degenerate 1x1 mesh (config-5 shape,
# full pipeline through dist/pyramid_tiled.py)
from opticalflowhs_tpu.dist import hs_pyramid_tiled, make_mesh
mesh = make_mesh(MeshConfig(batch=1, y=1, x=1))
i1, i2 = pair(0, 2176, 3840, seed=3)
dt = timeit(lambda: hs_pyramid_tiled(i1, i2, cfg, pyr, mesh=mesh, halo_sweeps=8), n=15)
results["4k_pyramid3_tiled_1chip"] = {"ms": round(dt*1e3, 2), "fps": round(1/dt, 1)}
print("4k_pyramid3_tiled_1chip", results["4k_pyramid3_tiled_1chip"], flush=True)

with open(OUT, "w") as f:
    json.dump(results, f, indent=2)
print("wrote", OUT, flush=True)
