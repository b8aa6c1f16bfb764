"""HW A/B: batched skewed kernel vs batched-banded at B2 x 4K (round 4).

    python tools/hw_skewed_batched.py skewed   # batched skewed kernel
    python tools/hw_skewed_batched.py banded   # HSFLOW_SKEWED_SOLVE=0 path

Appends to /tmp/hw_skewed_batched.json; n=20 steady-state chains.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

LEG = sys.argv[1] if len(sys.argv) > 1 else "skewed"
os.environ["HSFLOW_SKEWED_SOLVE"] = "1" if LEG == "skewed" else "0"

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.batch import hs_solve_batched
from opticalflowhs_tpu.config import HSConfig

OUT = "/tmp/hw_skewed_batched.json"
results = json.load(open(OUT)) if os.path.exists(OUT) else {}

B, H, W, IT = 2, 2176, 3840, 100
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
cfg = HSConfig(alpha=0.5, iters=IT, backend="pallas")

t0 = time.time()
flow = hs_solve_batched(i1, i2, cfg)
float(jnp.sum(flow.u))
n = 20
t1 = time.perf_counter()
for _ in range(n):
    flow = hs_solve_batched(i1, i2, cfg)
jax.block_until_ready(flow)
dt = (time.perf_counter() - t1) / n
gpx = B * H * W * IT / dt / 1e9
print(f"[{LEG}] B{B}x4K i{IT}: {dt*1e3:.3f} ms ({gpx:.1f} Gpx*sweeps/s) "
      f"[compile {time.time()-t0:.0f}s]", flush=True)
results[f"{LEG}_b{B}_4k_ms"] = round(dt * 1e3, 3)
results[f"{LEG}_b{B}_4k_gpx"] = round(gpx, 2)
if LEG == "skewed":
    ref = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=IT,
                                            backend="jnp"))
    dd = max(float(jnp.abs(flow.u - ref.u).max()),
             float(jnp.abs(flow.v - ref.v).max()))
    print(f"[{LEG}] maxdiff vs jnp: {dd:.3e}", flush=True)
    results["b2_4k_maxdiff"] = dd
json.dump(results, open(OUT, "w"), indent=1)
print("DONE", flush=True)
