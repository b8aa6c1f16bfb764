"""HW A/B (round-5 VERDICT item 6): resident Charbonnier-IRLS kernel vs
the jnp IRLS path, plus the production-size seam benchmark.

Round 4 published robust only at 18.9 ms/frame (jnp, 1080p i100) and only
in its UNFAVORABLE regime (plain translation, EPE 0.2459). This measures:
 1. exactness on chip: resident robust == jnp at 1080p i20
 2. 1080p i100 timing: resident whole-solve vs jnp IRLS (n=30 chains)
 3. the favorable regime at PRODUCTION size: two-motion seam at 1080p,
    robust vs classic HS at equal budget — whole-frame AND seam-band EPE
    (the small-size result was seam-EPE halving; test_robust.py)
Writes /tmp/hw_robust_ab.json as it goes.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.data.synthetic import two_motion_pair
from opticalflowhs_tpu.solver import hs_solve

OUT = "/tmp/hw_robust_ab.json"
results = {}


def save():
    json.dump(results, open(OUT, "w"), indent=1)


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=30):
    out = fn()
    sync(out)
    fn()  # absorb the post-idle wake-up spike
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


H, W = 1088, 1920
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

# -- leg 1: exactness ---------------------------------------------------------
cfg20 = dict(alpha=0.4, iters=20, solver="robust")
fp = hs_solve(i1, i2, HSConfig(backend="pallas", **cfg20))
fj = hs_solve(i1, i2, HSConfig(backend="jnp", **cfg20))
d = max(float(jnp.abs(fp.u - fj.u).max()), float(jnp.abs(fp.v - fj.v).max()))
print(f"exact 1080p i20: max|resident_robust - jnp| = {d}", flush=True)
results["exact_1080p_i20"] = d
save()

# -- leg 2: 1080p i100 timing -------------------------------------------------
for backend in ("pallas", "jnp"):
    cfg = HSConfig(alpha=0.25, iters=100, solver="robust", backend=backend)
    dt = timeit(lambda: hs_solve(i1, i2, cfg))
    print(f"1080p robust i100 {backend}: {dt*1e3:.3f} ms = "
          f"{H*W*100/dt/1e9:.2f} Gpx*sweeps/s", flush=True)
    results[f"1080p_i100_{backend}_ms"] = dt * 1e3
    save()

# -- leg 3: favorable regime at production size -------------------------------
s1, s2, gt = two_motion_pair(H, W, (1.0, 0.0), (-1.0, 0.0), key=3)
s1, s2 = jnp.asarray(s1), jnp.asarray(s2)
band = np.zeros((H, W), bool)
band[8:-8, W // 2 - 8 : W // 2 + 8] = True
inner = np.zeros((H, W), bool)
inner[8:-8, 8:-8] = True


def epe_of(f, mask):
    fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
    return float(np.sqrt(((fl - gt) ** 2).sum(-1))[mask].mean())


for tag, cfg in (
    ("classic_i400", HSConfig(alpha=0.1, iters=400)),
    ("robust_i400", HSConfig(alpha=0.1, iters=400, solver="robust",
                             robust_eps_s=0.01)),
):
    fn = lambda: hs_solve(s1, s2, cfg)
    dt = timeit(fn, n=10)
    f = fn()
    e_all = epe_of(f, inner)
    e_band = epe_of(f, band)
    print(f"seam 1080p {tag}: {dt*1e3:8.2f} ms  EPE(interior) {e_all:.4f}  "
          f"EPE(seam band) {e_band:.4f}", flush=True)
    results[f"seam_{tag}"] = {"ms": dt * 1e3, "epe": e_all,
                              "epe_band": e_band}
    save()
print("DONE", flush=True)
