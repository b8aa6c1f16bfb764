"""HW: does a taller VMEM budget help the fused megakernel at 8K/4K-i20?
The fused/banded pickers budget 100 MB (_VMEM_BUDGET) while the round-3/4
kernels proved ~118 MB is usable; taller bands = fewer grid steps on the
per-op-fixed-cost-bound sizes. Run once with the default and once with
HSFLOW_VMEM_BUDGET=118000000 (separate processes):
    python tools/hw_8k_budget.py default
    HSFLOW_VMEM_BUDGET=118000000 python tools/hw_8k_budget.py tall
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

LEG = sys.argv[1] if len(sys.argv) > 1 else "default"
OUT = "/tmp/hw_8k_budget.json"
results = json.load(open(OUT)) if os.path.exists(OUT) else {}

for name, (h, w, it, n) in {
    "8k_i50": (4352, 7680, 50, 20),
    "4k_i20": (2176, 3840, 20, 30),
}.items():
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=it, backend="pallas")
    t0 = time.time()
    f = hs_solve(i1, i2, cfg); float(jnp.sum(f.u))
    t1 = time.perf_counter()
    for _ in range(n):
        f = hs_solve(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter() - t1) / n
    gpx = h * w * it / dt / 1e9
    print(f"[{LEG}] {name}: {dt*1e3:.3f} ms ({gpx:.1f}) [compile {time.time()-t0:.0f}s]", flush=True)
    results[f"{LEG}_{name}_ms"] = round(dt * 1e3, 3)
    json.dump(results, open(OUT, "w"), indent=1)
print("DONE", flush=True)
