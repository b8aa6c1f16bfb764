"""Driver benchmark: Jacobi sweep throughput on one chip.

Prints ONE JSON line. Headline metric: whole-solve throughput in
Gpx*sweeps/s per chip on a 1088x1920 (config-4 HD) frame, 100 iterations
(the BASELINE.md "Jacobi sweep throughput" row). vs_baseline is the
fraction of the VPU-COMPUTE speed-of-light (6.14 T-instr/s architectural
VPU peak / 25 fused instructions per px-sweep = 245.6 Gpx*sweeps/s —
opticalflowhs_tpu/bench.py; round 4 changed this denominator from the
25.6 streaming SoL, which stopped applying once the resident kernel
stopped streaming, so vs_baseline dropped ~9.6x with no change in
`value`). The streaming roofline is still reported in detail. The
reference publishes no numbers of its own (BASELINE.json "published": {}).

Axon-platform quirk: the first execution must be synced with a host readback
(block_until_ready alone does not force the deferred remote compile); timing
loops only after that.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from opticalflowhs_tpu.bench import (
        compute_roofline_gpx_sweeps,
        roofline_gpx_sweeps,
    )
    from opticalflowhs_tpu.config import HSConfig
    from opticalflowhs_tpu.solver import hs_solve

    h, w, iters = 1088, 1920, 100  # config-4 HD streaming frame
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend)
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))

    flow = hs_solve(i1, i2, cfg)
    float(jnp.sum(flow.u))  # full sync: forces deferred compile + execute

    # n = 50: the axon tunnel charges ~25 ms to the FIRST call after any
    # idle gap (profiled, docs/PERFORMANCE.md round 3); steady-state
    # chained calls run at device time, so a longer unsynced chain
    # measures the sustained throughput a streaming deployment sees.
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        flow = hs_solve(i1, i2, cfg)
    jax.block_until_ready(flow)
    dt = (time.perf_counter() - t0) / n

    gpx_sweeps = h * w * iters / dt / 1e9
    kind = str(jax.devices()[0].device_kind)
    # The headline path (VMEM-resident whole solve) streams almost nothing,
    # so the meaningful baseline is the VPU-compute speed-of-light
    # (architectural VPU peak / 25 fused instructions per px-sweep); the fp32
    # HBM-streaming SoL is reported alongside for the paths that stream
    # (round-3 VERDICT item 6: "3.1x streaming SoL" was a category error).
    sol_compute = compute_roofline_gpx_sweeps(kind)
    sol_stream = roofline_gpx_sweeps(kind)
    print(
        json.dumps(
            {
                "metric": "jacobi_sweep_throughput",
                "value": round(gpx_sweeps, 3),
                "unit": "Gpx*sweeps/s/chip",
                "vs_baseline": round(gpx_sweeps / sol_compute, 4),
                "vs_compute_sol": round(gpx_sweeps / sol_compute, 4),
                "vs_streaming_sol": round(gpx_sweeps / sol_stream, 4),
                "detail": {
                    # vs_baseline changed denominator in round 4 (25.6
                    # streaming SoL -> 245.6 compute SoL, a ~9.6x drop with
                    # `value` unchanged); the two explicit vs_* fields above
                    # carry both denominations so cross-round trending has a
                    # stable key (ADVICE r04).
                    "vs_baseline_denominator_changed_in": "round 4",
                    "shape": [h, w],
                    "iters": iters,
                    "backend": backend,
                    "ms_per_solve": round(dt * 1e3, 3),
                    "device": kind,
                    "baseline_is": (
                        f"VPU-compute speed-of-light "
                        f"({sol_compute:.1f} Gpx*sweeps/s = 6.14 T-instr/s "
                        f"architectural VPU peak / 25 fused instructions "
                        f"per px-sweep; opticalflowhs_tpu/bench.py)"
                    ),
                    "compute_roofline_gpx_sweeps": round(sol_compute, 1),
                    "streaming_roofline_gpx_sweeps": round(sol_stream, 1),
                    "compute_utilization_pct": round(
                        100 * gpx_sweeps / sol_compute, 1
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
