"""Benchmark harness (component N15; SURVEY.md §5.5/§6).

Emits the BASELINE metric triplet [BASELINE.json]: Jacobi sweep throughput
(Mpx/s/chip), solve latency / frames-per-second at the current chip count,
plus achieved-vs-roofline HBM bandwidth. The reference printed wall-clock
around its OpenCL loop (SURVEY.md §5.1); here timing is
`jax.block_until_ready` + perf_counter with a mandatory full host-readback
warmup (the axon remote platform defers compilation past block_until_ready),
and optional `jax.profiler.trace` capture via --profile-dir.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np

# fp32 HBM-roofline speed-of-light for one fused sweep: u,v read+write plus
# 4 loop-invariant field reads ~= 32 B/px streamed (SURVEY.md §3.2, §6).
SWEEP_BYTES_PER_PX = 32
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0}


def _sync_warm(fn, *args):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0]))  # full host sync; forces deferred remote compile
    return out


def _timeit(fn, args, repeats: int) -> float:
    import jax

    _sync_warm(fn, *args)
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def run_bench(
    rc=None,
    shape=(1024, 1280),
    profile_dir: Optional[str] = None,
    repeats: int = 10,
) -> dict:
    import jax
    import jax.numpy as jnp

    from opticalflowhs_tpu.config import RunConfig
    from opticalflowhs_tpu.pyramid import hs_pyramid
    from opticalflowhs_tpu.solver import hs_solve

    rc = rc or RunConfig()
    h, w = shape
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))

    dev = jax.devices()[0]
    ctx = (
        jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )
    with ctx:
        dt_solve = _timeit(lambda a, b: hs_solve(a, b, rc.hs), (i1, i2), repeats)
        results_pyr = None
        if rc.pyramid.levels > 1:
            dt_pyr = _timeit(
                lambda a, b: hs_pyramid(a, b, rc.hs, rc.pyramid), (i1, i2), repeats
            )
            results_pyr = {
                "ms_per_frame": round(dt_pyr * 1e3, 3),
                "fps": round(1.0 / dt_pyr, 2),
            }

    px_sweeps = h * w * rc.hs.iters
    gpx_s = px_sweeps / dt_solve / 1e9
    hbm_peak = HBM_GBPS.get(dev.device_kind, 819.0)
    sol_gpx = hbm_peak / SWEEP_BYTES_PER_PX
    return {
        "device": dev.device_kind,
        "backend": rc.hs.backend,
        "shape": [h, w],
        "iters": rc.hs.iters,
        "sweep_throughput": {
            "mpx_per_s_per_chip": round(gpx_s * 1e3, 1),
            "gpx_sweeps_per_s": round(gpx_s, 3),
            "ms_per_solve": round(dt_solve * 1e3, 3),
            "fps_single_level": round(1.0 / dt_solve, 2),
            "achieved_GBps_lower_bound": round(gpx_s * SWEEP_BYTES_PER_PX, 1),
            "roofline_GBps": hbm_peak,
            "roofline_gpx_sweeps_per_s": round(sol_gpx, 1),
            "fraction_of_roofline": round(gpx_s / sol_gpx, 4),
        },
        "pyramid": results_pyr,
        "n_devices": jax.device_count(),
    }
