"""HW: per-family 1080p steady-state table (round-4 VERDICT item 5).

For every solver/model family at 1088x1920: steady-state ms (n-chain
timing), Gpx*sweeps/s where a sweep count is meaningful, and time-to-EPE
against analytic synthetic ground truth (uniform subpixel translation —
the accuracy metric users actually buy solvers for).

Writes /tmp/hw_family_table.json. One process; each family is its own jit
signature so legs don't share caches.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.config import HSConfig, LKConfig, PyramidConfig, TVL1Config
from opticalflowhs_tpu.data.synthetic import translation_pair
from opticalflowhs_tpu.lucas_kanade import lk_solve
from opticalflowhs_tpu.metrics import epe
from opticalflowhs_tpu.solver import hs_solve, tune_omega
from opticalflowhs_tpu.tvl1 import tvl1_solve

OUT = "/tmp/hw_family_table.json"
H, W = 1088, 1920
results = json.load(open(OUT)) if os.path.exists(OUT) else {}

i1n, i2n, gt = translation_pair(H, W, 0.7, -0.3, key=1)
i1 = jnp.asarray(i1n)
i2 = jnp.asarray(i2n)
# interior crop for EPE (the HS boundary condition biases a thin edge band)
M = 16
gt_c = gt[M:-M, M:-M]


def timeit(fn, n=30):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def record(name, fn, sweeps=None, n=30):
    t0 = time.time()
    dt, flow = timeit(fn, n)
    f = np.stack([np.asarray(flow.u), np.asarray(flow.v)], axis=-1)
    e = epe(f[M:-M, M:-M], gt_c)
    row = {"ms": round(dt * 1e3, 3), "epe": round(e, 6),
           "fps": round(1 / dt, 1)}
    if sweeps:
        row["gpx_sweeps_s"] = round(H * W * sweeps / dt / 1e9, 2)
    results[name] = row
    print(f"{name}: {row} [compile {time.time()-t0:.0f}s]", flush=True)
    json.dump(results, open(OUT, "w"), indent=1)


ALPHA = 0.25  # strong-texture synthetic: data-dominated regime

# -- Jacobi (resident whole-solve kernel path) --------------------------------
for it in (100, 400):
    cfg = HSConfig(alpha=ALPHA, iters=it, backend="pallas")
    record(f"jacobi_i{it}", lambda cfg=cfg: hs_solve(i1, i2, cfg), sweeps=it)

# -- SOR (auto-tuned omega; banded kernel at 1080p) ---------------------------
t0 = time.time()
omega = tune_omega(i1, i2, HSConfig(alpha=ALPHA, solver="sor"))
print(f"tuned omega = {omega} [{time.time()-t0:.0f}s]", flush=True)
results["sor_omega"] = omega
for it in (50, 100):
    cfg = HSConfig(alpha=ALPHA, iters=it, solver="sor", omega=omega,
                   backend="pallas")
    record(f"sor_i{it}", lambda cfg=cfg: hs_solve(i1, i2, cfg), sweeps=it)

# -- Multigrid (V(2,2) cycles; jnp/XLA — fine-sweep-bound after the round-5
# restrict stride fix, tools/hw_lk_mg_round5.py) ------------------------------
for cyc in (2, 5):
    cfg = HSConfig(alpha=ALPHA, iters=cyc, solver="multigrid",
                   backend="pallas")
    record(f"multigrid_c{cyc}", lambda cfg=cfg: hs_solve(i1, i2, cfg))

# -- Robust (Charbonnier IRLS; jnp/XLA by design) -----------------------------
cfg = HSConfig(alpha=ALPHA, iters=100, solver="robust", backend="pallas")
record("robust_i100", lambda cfg=cfg: hs_solve(i1, i2, cfg), sweeps=100)

# -- Lucas-Kanade (3-level pyramid) -------------------------------------------
lk_cfg = LKConfig()
pyr = PyramidConfig(levels=3)
record("lk_pyr3", lambda: lk_solve(i1, i2, lk_cfg, pyr))

# -- TV-L1 (3-level pyramid, IPOL defaults) -----------------------------------
tv_cfg = TVL1Config()
record("tvl1_pyr3", lambda: tvl1_solve(i1, i2, tv_cfg, pyr), n=10)

print("DONE", flush=True)
