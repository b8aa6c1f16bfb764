"""HW A/B: batched resident kernel vs batched-banded at video shapes.

Decides whether resident_solve_enabled(batched=True) should default on.
Writes /tmp/hw_resident_batched.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import opticalflowhs_tpu.kernels.solve_resident as sr
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.batch import hs_solve_batched

OUT = "/tmp/hw_resident_batched.json"
results = {}


def timeit(fn, n=30):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def stack(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32)),
    )


IT = 100
for b, h, w in ((2, 1088, 1920), (4, 1088, 1920)):
    i1, i2 = stack(b, h, w)
    px = b * h * w * IT / 1e9

    fn_res = jax.jit(lambda a, c: sr.hs_solve_resident_batched(a, c, 0.5, IT))
    t = timeit(lambda: fn_res(i1, i2))
    ur, vr = fn_res(i1, i2)
    print(f"resident batched B{b} {h}x{w} i{IT}: {t*1e3:.3f} ms "
          f"({px/t:.1f} Gpx*sweeps/s)", flush=True)
    results[f"resident_b{b}_ms"] = round(t * 1e3, 3)

    os.environ["HSFLOW_RESIDENT_SOLVE"] = "0"
    cfg = HSConfig(alpha=0.5, iters=IT, backend="pallas")
    t = timeit(lambda: hs_solve_batched(i1, i2, cfg))
    fb = hs_solve_batched(i1, i2, cfg)
    dd = max(float(jnp.abs(ur - fb.u).max()), float(jnp.abs(vr - fb.v).max()))
    print(f"batched-banded  B{b}: {t*1e3:.3f} ms ({px/t:.1f}) "
          f"maxdiff={dd:.2e}", flush=True)
    results[f"banded_b{b}_ms"] = round(t * 1e3, 3)
    results[f"b{b}_maxdiff"] = dd
    os.environ.pop("HSFLOW_RESIDENT_SOLVE", None)
    json.dump(results, open(OUT, "w"), indent=1)
print("DONE", flush=True)
