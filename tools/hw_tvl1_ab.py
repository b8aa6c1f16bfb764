"""HW A/B (round-5 VERDICT item 2): fused TV-L1 inner-loop kernel vs the
jnp fori_loop path at 1080p — the family table's 543 ms/frame row.

Legs:
 1. single-level 1080p, warps=2 iters=30: kernel vs jnp backends, flow
    agreement (trajectory tolerance — the warp gather amplifies ULPs; the
    bitwise per-iteration equivalence is CI-covered in
    tests/unit/test_tvl1_inner.py)
 2. the family-table row: 3-level pyramid, IPOL defaults (warps=5/level,
    iters=100, median on) — kernel vs jnp wall time, n=10 chains
 3. accuracy on the family-table workload (alpha-free: TV-L1 has its own
    lambda) — EPE vs the (0.7, -0.3) translation GT
Writes /tmp/hw_tvl1_ab.json as it goes.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.config import PyramidConfig, TVL1Config
from opticalflowhs_tpu.data.synthetic import translation_pair
from opticalflowhs_tpu.metrics import epe, interior
from opticalflowhs_tpu.tvl1 import tvl1_solve

OUT = "/tmp/hw_tvl1_ab.json"
results = {}


def save():
    json.dump(results, open(OUT, "w"), indent=1)


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=10):
    out = fn()
    sync(out)
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


H, W = 1088, 1920
i1, i2, gt = translation_pair(H, W, 0.7, -0.3, key=5)
i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
gtc = interior(gt, 16)

# -- leg 1: small-budget agreement + timing -----------------------------------
pyr1 = PyramidConfig(levels=1, iters_per_level=())
flows = {}
for backend in ("pallas", "jnp"):
    cfg = TVL1Config(iters=30, warps=2, backend=backend)
    fn = lambda: tvl1_solve(i1, i2, cfg, pyr1)
    dt = timeit(fn, n=5)
    f = fn()
    flows[backend] = f
    print(f"1080p 1-level w2 i30 {backend}: {dt*1e3:.2f} ms", flush=True)
    results[f"lvl1_w2_i30_{backend}_ms"] = dt * 1e3
    save()
d = max(float(jnp.abs(flows["pallas"].u - flows["jnp"].u).max()),
        float(jnp.abs(flows["pallas"].v - flows["jnp"].v).max()))
print(f"flow agreement (trajectory tol): max|d| = {d}", flush=True)
results["lvl1_flow_maxdiff"] = d
save()

# -- leg 2+3: family-table row ------------------------------------------------
pyr3 = PyramidConfig(levels=3, iters_per_level=())
for backend in ("pallas", "jnp"):
    cfg = TVL1Config(backend=backend)  # IPOL defaults: warps=5, iters=100
    fn = lambda: tvl1_solve(i1, i2, cfg, pyr3)
    dt = timeit(fn, n=10)
    f = fn()
    fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
    e = float(epe(interior(fl, 16), gtc))
    print(f"family row 3-level IPOL {backend}: {dt*1e3:.2f} ms  EPE {e:.6g}",
          flush=True)
    results[f"family_{backend}"] = {"ms": dt * 1e3, "epe": e}
    save()
print("DONE", flush=True)
