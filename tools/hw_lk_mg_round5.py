"""HW: (a) LK warp-radius A/B, (b) multigrid fine/coarse split (round 5).

(a) lucas_kanade.lk_refine does `iters` warps per LEVEL (one per Newton
    refinement, 3x the HS pyramid's warp count) but hard-coded the R=4
    select loop until round 5; this A/Bs radius=4 (old behavior) vs the
    on-device auto (PyramidConfig.warp_radius=0, now threaded through)
    vs pinned R=2, at the family-table workload (1088x1920, 3 levels).

(b) The family table labels multigrid "jnp by design (dispatch-bound
    small grids)" — an asserted split, never measured (the same pattern
    the round-4 robust claim died of). Pin it: time c1 vs c2 (slope =
    per-cycle cost), then the k=0 fine-level pieces alone (4 GS sweeps;
    residual+restrict+prolong) so the coarse-hierarchy share is the
    remainder, measured not asserted.

Writes /tmp/hw_lk_mg_round5.json. One process, serial jit signatures.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu import multigrid
from opticalflowhs_tpu.config import HSConfig, LKConfig, PyramidConfig
from opticalflowhs_tpu.data.synthetic import translation_pair
from opticalflowhs_tpu.lucas_kanade import lk_solve
from opticalflowhs_tpu.metrics import epe
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.solver import hs_solve

OUT = "/tmp/hw_lk_mg_round5.json"
H, W = 1088, 1920
results = json.load(open(OUT)) if os.path.exists(OUT) else {}

i1n, i2n, gt = translation_pair(H, W, 0.7, -0.3, key=1)
i1 = jnp.asarray(i1n)
i2 = jnp.asarray(i2n)
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


def record(name, fn, n=30, with_epe=True):
    if name in results:
        print(f"{name}: cached {results[name]}", flush=True)
        return results[name]
    t0 = time.time()
    dt, out = timeit(fn, n)
    row = {"ms": round(dt * 1e3, 3)}
    if with_epe:
        f = np.stack([np.asarray(out.u), np.asarray(out.v)], axis=-1)
        row["epe"] = round(epe(f[M:-M, M:-M], gt_c), 6)
    results[name] = row
    print(f"{name}: {row} [compile {time.time()-t0:.0f}s]", flush=True)
    json.dump(results, open(OUT, "w"), indent=1)
    return row


# ---- (a) LK warp-radius A/B -------------------------------------------------
lk_cfg = LKConfig()
for r in (4, 0, 2):
    pyr = PyramidConfig(levels=3, warp_radius=r)
    record(f"lk_pyr3_r{r}", lambda pyr=pyr: lk_solve(i1, i2, lk_cfg, pyr))

# ---- (b) multigrid split ----------------------------------------------------
ALPHA = 0.25
for cyc in (1, 2):
    cfg = HSConfig(alpha=ALPHA, iters=cyc, solver="multigrid", backend="pallas")
    record(f"mg_c{cyc}", lambda cfg=cfg: hs_solve(i1, i2, cfg))

# Fine-level pieces in isolation (same arithmetic mg's k=0 visit runs per
# cycle: NU1+NU2 GS sweeps, one residual, one restriction, one prolongation
# + correction add).
a2 = ALPHA * ALPHA
ex, ey, et = stencils.derivatives(i1, i2, "central")
lvl = multigrid._level(ex * ex, ex * ey, ey * ey, a2)
gu, gv = -ex * et, -ey * et
ze = jnp.zeros_like(i1)


@jax.jit
def fine_sweeps(u, v):
    return multigrid.gs_general(u, v, gu, gv, lvl, multigrid.NU1 + multigrid.NU2)


@jax.jit
def fine_transfer(u, v):
    exx, exy, eyy, a2_, *_ = lvl
    ru, rv = multigrid.residual(u, v, gu, gv, exx, exy, eyy, a2_)
    rcu, rcv = 4.0 * multigrid.restrict(ru), 4.0 * multigrid.restrict(rv)
    h, w = u.shape
    return u + multigrid.prolong(rcu, h, w), v + multigrid.prolong(rcv, h, w)


record("mg_fine_sweeps_x4", lambda: fine_sweeps(ze, ze), with_epe=False)
record("mg_fine_transfer", lambda: fine_transfer(ze, ze), with_epe=False)

# The c1 intercept is NOT cycle work: derivatives + _build_levels (the
# coefficient hierarchy: 3 restrictions + 2x2 idet + color masks per
# level). Time it alone so the fixed cost is attributed, not guessed.
@jax.jit
def hierarchy(a, b):
    exf, eyf, etf = stencils.derivatives(a, b, "central")
    levels = multigrid._build_levels(exf, eyf, ALPHA)
    return levels[-1][0], levels[0][4]


record("mg_build_levels", lambda: hierarchy(i1, i2), with_epe=False)

per_cycle = results["mg_c2"]["ms"] - results["mg_c1"]["ms"]
fine = results["mg_fine_sweeps_x4"]["ms"] + results["mg_fine_transfer"]["ms"]
results["mg_split"] = {
    "per_cycle_ms": round(per_cycle, 3),
    "fine_level_ms": round(fine, 3),
    "coarse_hierarchy_ms": round(per_cycle - fine, 3),
    "fine_share": round(fine / per_cycle, 3) if per_cycle > 0 else None,
    "fixed_intercept_ms": round(results["mg_c1"]["ms"] - per_cycle, 3),
    "build_levels_ms": results["mg_build_levels"]["ms"],
}
print("mg_split:", results["mg_split"], flush=True)
json.dump(results, open(OUT, "w"), indent=1)
print("DONE", flush=True)
