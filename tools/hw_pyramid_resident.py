"""HW: 3-level 1080p pyramid with the round-4 routing (solve_level ->
resident whole-solve kernel at EVERY level) vs the old precompute+sweeps
level path. Round-3 VERDICT item 1; target steady-state <= ~6 ms (the
round-2 number was 11.36 ms with the spike-contaminated n=10 loop).

One leg per process (the jit cache ignores env-var flips):
    python tools/hw_pyramid_resident.py resident   # new default routing
    python tools/hw_pyramid_resident.py classic    # RESIDENT=0 FUSED=0
Appends to /tmp/hw_pyramid_resident.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

LEG = sys.argv[1] if len(sys.argv) > 1 else "resident"
if LEG == "classic":
    os.environ["HSFLOW_RESIDENT_SOLVE"] = "0"
    os.environ["HSFLOW_FUSED_SOLVE"] = "0"

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.config import HSConfig, PyramidConfig
from opticalflowhs_tpu.pyramid import hs_pyramid

OUT = "/tmp/hw_pyramid_resident.json"
results = {}
if os.path.exists(OUT):
    results = json.load(open(OUT))

rng = np.random.default_rng(2)
h, w = 1088, 1920
i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
cfg = HSConfig(alpha=0.5, iters=100, backend="pallas")
pyr = PyramidConfig(levels=3)

t0 = time.time()
flow = hs_pyramid(i1, i2, cfg, pyr)
float(jnp.sum(flow.u))  # force deferred remote compile + execute
print(f"[{LEG}] compile+first: {time.time()-t0:.1f} s", flush=True)

n = 50  # steady-state chain (the ~25 ms tunnel wake-up spike amortizes out)
t0 = time.perf_counter()
for _ in range(n):
    flow = hs_pyramid(i1, i2, cfg, pyr)
jax.block_until_ready(flow)
dt = (time.perf_counter() - t0) / n
print(f"[{LEG}] pyramid3 1080p i100: {dt*1e3:.3f} ms ({1/dt:.1f} fps)",
      flush=True)
results[LEG + "_ms"] = round(dt * 1e3, 3)

if LEG == "resident":
    # exactness vs the jnp oracle path (same association order end to end)
    cfgj = HSConfig(alpha=0.5, iters=100, backend="jnp")
    fj = hs_pyramid(i1, i2, cfgj, pyr)
    dd = max(float(jnp.abs(flow.u - fj.u).max()),
             float(jnp.abs(flow.v - fj.v).max()))
    print(f"[{LEG}] maxdiff vs jnp: {dd:.3e}", flush=True)
    results["maxdiff_vs_jnp"] = dd

json.dump(results, open(OUT, "w"), indent=1)
print("DONE", flush=True)
