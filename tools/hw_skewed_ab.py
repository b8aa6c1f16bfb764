"""HW A/B: u/v-resident time-skewed kernel vs the fused banded pipeline at
beyond-residency sizes (round-4 VERDICT item 4). One leg per process (the
jit cache ignores env flips):

    python tools/hw_skewed_ab.py skewed   # HSFLOW_SKEWED_SOLVE=1
    python tools/hw_skewed_ab.py fused    # HSFLOW_SKEWED_SOLVE=0

Appends to /tmp/hw_skewed_ab.json. Steady-state n=30 chain timing.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

LEG = sys.argv[1] if len(sys.argv) > 1 else "skewed"
os.environ["HSFLOW_SKEWED_SOLVE"] = "1" if LEG == "skewed" else "0"
if LEG == "skewed":
    # the A/B deliberately runs the skewed schedule below its auto class
    os.environ.setdefault("HSFLOW_SKEWED_MIN_PX", "0")

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

OUT = "/tmp/hw_skewed_ab.json"
results = json.load(open(OUT)) if os.path.exists(OUT) else {}


def pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)))


def timeit(fn, n=30):
    out = fn()
    float(jnp.sum(out.u))  # forces the deferred remote compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


for name, (h, w, iters) in {
    "1440p_i100": (1440, 2560, 100),
    "4k_i100": (2176, 3840, 100),
    "4k_i20": (2176, 3840, 20),
}.items():
    i1, i2 = pair(h, w)
    cfg = HSConfig(alpha=0.5, iters=iters, backend="pallas")
    t0 = time.time()
    dt, flow = timeit(lambda: hs_solve(i1, i2, cfg))
    gpx = h * w * iters / dt / 1e9
    print(f"[{LEG}] {name}: {dt*1e3:.3f} ms ({gpx:.1f} Gpx*sweeps/s) "
          f"[compile {time.time()-t0:.0f}s]", flush=True)
    results[f"{LEG}_{name}_ms"] = round(dt * 1e3, 3)
    results[f"{LEG}_{name}_gpx"] = round(gpx, 2)
    if LEG == "skewed" and name == "4k_i20":
        # exactness leg at a cheap sweep count vs the jnp backend
        fj = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=iters, backend="jnp"))
        dd = max(float(jnp.abs(flow.u - fj.u).max()),
                 float(jnp.abs(flow.v - fj.v).max()))
        print(f"[{LEG}] {name} maxdiff vs jnp: {dd:.3e}", flush=True)
        results["skewed_4k_i20_maxdiff"] = dd
    json.dump(results, open(OUT, "w"), indent=1)
print("DONE", flush=True)
