"""HW: drift-free re-timing of the fused-geometry candidates (round 3).

hw_geom_sweep.py measured candidates sequentially and its timings drifted
monotonically faster over ~25 minutes (process/tunnel warm-up), so the
ranking is contaminated. This pass re-times ALL candidates (compiles are
already cached by the helper) in ROUND-ROBIN order over many rounds and
reports the per-candidate MIN and median — drift cancels because every
round touches every candidate.

Run: nohup python tools/hw_geom_retime.py > /tmp/hw_geom2.log 2>&1 &
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.kernels.jacobi import _round_up
from opticalflowhs_tpu.kernels.solve_fused import _solve_zero_ad

H, W = 1088, 1920
ITERS = 100
ALPHA = 1.0

CANDS = [
    (8, 4, 8, 136, 1088),
    (8, 4, 8, 272, 1088),
    (10, 0, 16, 272, 1088),
    (16, 4, 16, 272, 1088),
    (8, 4, 8, 544, 1088),
    (10, 0, 16, 544, 1088),
    (16, 4, 16, 544, 1088),
]


def main():
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

    fns = []
    for geom in CANDS:
        fn = jax.jit(lambda a, b, g=geom: _solve_zero_ad(
            a, b, ALPHA, ITERS, "hs_cube", g, False))
        try:
            out = fn(i1, i2)
            float(jnp.sum(out[0]))  # force deferred remote compile
            fns.append((geom, fn))
            print(f"compiled s={geom[0]} band={geom[3]}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"s={geom[0]} band={geom[3]}: compile FAILED "
                  f"{str(e)[:100]}", flush=True)

    rounds = 12
    times = {g: [] for g, _ in fns}
    for r in range(rounds):
        for geom, fn in fns:
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(i1, i2)
            jax.block_until_ready(out)
            times[geom].append((time.perf_counter() - t0) / 10)
        print(f"round {r + 1}/{rounds} done", flush=True)

    print(f"\n{'geom':>22} {'min ms':>8} {'med ms':>8} {'Gpx*s/s':>8}")
    best = None
    for geom, ts in times.items():
        ts = sorted(t * 1e3 for t in ts)
        mn, med = ts[0], ts[len(ts) // 2]
        rate = H * W * ITERS / (mn * 1e-3) / 1e9
        s, rem, sigma, band, hp = geom
        print(f"s={s:2d} sig={sigma:2d} band={band:3d} rem={rem:2d} "
              f"{mn:8.2f} {med:8.2f} {rate:8.1f}", flush=True)
        if best is None or mn < best[0]:
            best = (mn, geom)
    print(f"\nBEST (by min): s={best[1][0]} band={best[1][3]} "
          f"{best[0]:.2f} ms = "
          f"{H * W * ITERS / (best[0] * 1e-3) / 1e9:.1f} Gpx*sweeps/s",
          flush=True)


if __name__ == "__main__":
    main()
