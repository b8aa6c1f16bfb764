"""HW: fused-pipeline geometry sweep at 1080p — the round-3 fixed-cost attack.

The round-2 finding: 1080p i100 delivers 35.5-37.9 Gpx*sweeps/s while 4K
reaches 48.5 with the SAME kernels, and the in-kernel marginal rate is
~60. The suspect is geometry: pick_geometry's time model (17 ps/px-sweep +
30 us/step) makes it choose the fewest-band split (2x544 at 1080p), but 4K
runs 272-row bands with many more grid steps — and wins. This tool measures
REAL hardware time across admissible (s, band) candidates instead of
trusting the model, plus the classic multi-launch path at forced band
heights, then reports the ranking so the picker constants can be fixed
from data.

Run: nohup python tools/hw_geom_sweep.py > /tmp/hw_geom.log 2>&1 &
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.kernels.jacobi import _round_up
from opticalflowhs_tpu.kernels.solve_fused import (
    _ARRAYS,
    _solve_zero_ad,
    pick_geometry,
)

H, W = 1088, 1920
ITERS = 100
ALPHA = 1.0
VMEM = 100 * 1024 * 1024


def timeit(fn, n=20):
    out = fn()
    float(jnp.sum(out[0]))  # force the deferred remote compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def gpxs(ms):
    return H * W * ITERS / (ms * 1e-3) / 1e9


def main():
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    wp = _round_up(W, 128)

    auto = pick_geometry(H, wp, ITERS, jnp.float32, s_cap=0 or 32)
    print(f"picker's choice: s,rem,sigma,band,hp = {auto}", flush=True)

    # Admissible candidates: sigma = round_up(s, 8) divides band; window
    # fits the VMEM budget; hp = ceil(H/band)*band.
    cands = []
    for band in (136, 272, 544):
        for s in (8, 10, 16, 25, 32):
            sigma = _round_up(s, 8)
            if band % sigma:
                continue
            if (band + 2 * sigma) * wp * 4 * _ARRAYS > VMEM:
                continue
            nb = -(-H // band)
            hp = nb * band
            n_full, rem = divmod(ITERS, s)
            cands.append((s, rem, sigma, band, hp))

    ref = None
    results = []
    for geom in cands:
        s, rem, sigma, band, hp = geom
        fn = jax.jit(
            lambda a, b, g=geom: _solve_zero_ad(
                a, b, ALPHA, ITERS, "hs_cube", g, False
            )
        )
        try:
            dt = timeit(lambda: fn(i1, i2)) * 1e3
        except Exception as e:  # noqa: BLE001 — helper 500s etc.
            print(f"s={s:2d} band={band:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        u, v = fn(i1, i2)
        if ref is None:
            from opticalflowhs_tpu.config import HSConfig
            from opticalflowhs_tpu.solver import hs_solve

            r = hs_solve(i1, i2, HSConfig(alpha=ALPHA, iters=ITERS,
                                          backend="jnp"))
            ref = (r.u, r.v)
        d = max(float(jnp.abs(u - ref[0]).max()),
                float(jnp.abs(v - ref[1]).max()))
        print(f"s={s:2d} sigma={sigma:2d} band={band:3d} (nb={hp//band}, "
              f"rem={rem:2d}): {dt:6.2f} ms = {gpxs(dt):5.1f} Gpx*sweeps/s  "
              f"max|diff|={d:.1e}", flush=True)
        results.append((dt, geom))

    if results:
        results.sort()
        dt, geom = results[0]
        print(f"\nBEST: s={geom[0]} band={geom[3]}: {dt:.2f} ms = "
              f"{gpxs(dt):.1f} Gpx*sweeps/s", flush=True)


if __name__ == "__main__":
    main()
