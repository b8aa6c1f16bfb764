"""HW: interleaved 1080p-vs-4K per-pixel rate comparison (round 3).

RESULTS_HW (round 2) recorded 1080p i100 = 35.5 and 4K i100 = 48.5
Gpx*sweeps/s from different runs; hw_geom_retime showed same-process
sequential timings drift by ~25%, so that gap may be partly environmental.
This interleaves the two workloads (default solver path, auto geometry)
round-robin and reports drift-free mins — the honest measure of how much
1080p-specific overhead actually remains.

Run: nohup python tools/hw_1080p_vs_4k.py > /tmp/hw_1080_4k.log 2>&1 &
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

CASES = [
    ("1080p i100", (1088, 1920), 100),
    ("4K i100", (2176, 3840), 100),
    ("1024x1280 i100", (1024, 1280), 100),
]


def main():
    cfg = HSConfig(alpha=1.0, iters=100, backend="pallas")
    data = []
    for name, (h, w), iters in CASES:
        rng = np.random.default_rng(0)
        i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        c = HSConfig(alpha=1.0, iters=iters, backend="pallas")
        f = hs_solve(i1, i2, c)
        float(jnp.sum(f.u))  # force deferred remote compile
        data.append((name, i1, i2, c, h * w * iters))
        print(f"compiled {name}", flush=True)

    rounds = 10
    times = {name: [] for name, *_ in data}
    for r in range(rounds):
        for name, i1, i2, c, _ in data:
            t0 = time.perf_counter()
            for _ in range(8):
                f = hs_solve(i1, i2, c)
            jax.block_until_ready(f.u)
            times[name].append((time.perf_counter() - t0) / 8)
        print(f"round {r + 1}/{rounds}", flush=True)

    for name, _, _, _, pxs in data:
        ts = sorted(t * 1e3 for t in times[name])
        mn, med = ts[0], ts[len(ts) // 2]
        print(f"{name:16s} min {mn:7.2f} ms  med {med:7.2f} ms  "
              f"{pxs / (mn * 1e-3) / 1e9:5.1f} Gpx*sweeps/s (by min)",
              flush=True)


if __name__ == "__main__":
    main()
