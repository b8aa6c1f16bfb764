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

# THE canonical roofline accounting — every published number derives from
# these constants (root bench.py, docs/PERFORMANCE.md, BASELINE.md all
# import or cite them; do not fork a second accounting).
#
# STREAMING roofline: one fused Jacobi sweep that streams its operands
# moves 8 arrays per pixel: read u, v, Ex, Ey, Et, inv_den + write u, v =
# 32 B/px in fp32 (SURVEY.md §3.2). fp32 streaming speed-of-light on v5e:
# 819 / 32 = 25.6 Gpx*sweeps/s. It applies ONLY to paths that actually
# stream (the classic multi-launch schedule); temporal blocking and VMEM
# residency legitimately exceed it.
SWEEP_BYTES_PER_PX = 32
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0}

# COMPUTE roofline: the resident-class solves stream (almost) nothing, so
# their binding resource is VPU elementwise throughput. Canonical
# INSTRUCTION count of one sweep in the concat-clamp formulation
# (kernels/jacobi._kernel_step via solve_resident — the headline path),
# counting a fused multiply-add as ONE ALU instruction: per field, the
# separable [1,2,1] neighborhood average is 4 shifts + 2 (row fma/add) +
# 2 (lane fma/add) + 2 (scale/subtract) = 10; the fused update adds
# 3 (frac: two nested fmas + scale) + 1 + 1 (u/v fms): 2*10 + 5 = 25.
SWEEP_OPS_PER_PX = 25
# VPU architectural peak, fp32 T-instr/s: (8, 128) vector unit x 4
# independent ALUs per lane = 4096 ops/cycle at the ~1.5 GHz TensorCore
# clock implied by the public 197 TFLOPs bf16 MXU spec (197e12 / (4 MXUs
# x 128x128 x 2 flops) = 1.5e9). NOTE this is deliberately NOT the
# tools/hw_vpu_roofline.py microbench figure: chained one-op streams
# measure only 0.7-1.4 T-instr/s (each stage round-trips VMEM) while the
# real sweep kernel sustains ~2.4 — a microbench below the kernel it is
# supposed to bound is not a ceiling (docs/PERFORMANCE.md round 4).
VPU_TOPS = {"TPU v5 lite": 6.14, "TPU v5e": 6.14}


def roofline_gpx_sweeps(device_kind: str = "TPU v5e", dtype_bytes: int = 4) -> float:
    """Streaming (non-temporally-blocked) sweep speed-of-light, Gpx*sweeps/s."""
    peak = HBM_GBPS.get(device_kind, 819.0)
    return peak / (SWEEP_BYTES_PER_PX * dtype_bytes / 4)


def compute_roofline_gpx_sweeps(device_kind: str = "TPU v5e") -> float:
    """VPU-compute sweep speed-of-light, Gpx*sweeps/s: the architectural
    VPU instruction rate divided by the sweep's fused-instruction count.
    The right baseline for VMEM-resident/temporally-blocked paths that do
    not stream; `value / this` is device utilization in the compute
    sense."""
    tops = VPU_TOPS.get(device_kind, 6.14)
    return tops * 1e3 / SWEEP_OPS_PER_PX


def _sync_warm(fn, *args):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0]))  # full host sync; forces deferred remote compile
    return out


def _timeit(fn, args, repeats: int) -> float:
    """Readback-synced warmup, then one long unsynced call chain: the first
    call after any idle gap pays a ~25 ms tunnel wake-up spike on this
    machine (docs/PERFORMANCE.md round 3), so short loops smear it into
    every reading; >= ~50 chained calls amortize it below noise."""
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
    repeats: int = 50,
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


def run_scaling_bench(rc=None, shape=(512, 640), repeats: int = 30) -> dict:
    """The BASELINE metric triplet tail: frames/s at 1 and N chips.

    1 chip: batched video fps (DP). N chips (when a mesh is available, e.g.
    a pod slice or the CPU fake backend): DP-batched fps and spatially-tiled
    weak scaling — image area scaled with chip count, efficiency =
    T(1 tile alone) / T(N tiles together). On this machine only 1 real TPU
    exists [SURVEY.md §0 ENV]; multi-chip rows come from a real slice.
    """
    import jax
    import jax.numpy as jnp

    from opticalflowhs_tpu.batch import hs_solve_batched
    from opticalflowhs_tpu.config import MeshConfig, RunConfig
    from opticalflowhs_tpu.dist import hs_solve_tiled, make_mesh
    from opticalflowhs_tpu.dist.mesh import mesh_for_devices
    from opticalflowhs_tpu.solver import hs_solve

    rc = rc or RunConfig()
    h, w = shape
    n_dev = jax.device_count()
    rng = np.random.default_rng(0)
    out: dict = {"device": jax.devices()[0].device_kind, "n_devices": n_dev,
                 "shape": [h, w], "iters": rc.hs.iters}

    # fps at 1 chip: batched pairs (config 2 shape)
    batch = 8
    v1 = jnp.asarray(rng.uniform(0, 1, (batch, h, w)).astype(np.float32))
    v2 = jnp.asarray(rng.uniform(0, 1, (batch, h, w)).astype(np.float32))
    dt = _timeit(lambda a, b: hs_solve_batched(a, b, rc.hs), (v1, v2), repeats)
    out["fps_1chip_batched"] = round(batch / dt, 2)

    if n_dev > 1:
        mesh_cfg = mesh_for_devices(n_dev)
        mesh = make_mesh(mesh_cfg)
        # DP scaling: batch split over every device
        vb1 = jnp.asarray(rng.uniform(0, 1, (n_dev * 4, h, w)).astype(np.float32))
        vb2 = jnp.asarray(rng.uniform(0, 1, (n_dev * 4, h, w)).astype(np.float32))
        bmesh = make_mesh(MeshConfig(batch=n_dev, y=1, x=1))
        dt_n = _timeit(
            lambda a, b: hs_solve_batched(a, b, rc.hs, mesh=bmesh), (vb1, vb2), repeats
        )
        out[f"fps_{n_dev}chip_batched"] = round(vb1.shape[0] / dt_n, 2)
        # Weak scaling: one tile-sized image alone vs N tiles tiled
        th, tw = h, w
        big1 = jnp.asarray(
            rng.uniform(0, 1, (th * mesh_cfg.y, tw * mesh_cfg.x)).astype(np.float32)
        )
        big2 = jnp.asarray(
            rng.uniform(0, 1, big1.shape).astype(np.float32)
        )
        i1 = jnp.asarray(rng.uniform(0, 1, (th, tw)).astype(np.float32))
        i2 = jnp.asarray(rng.uniform(0, 1, (th, tw)).astype(np.float32))
        dt_one = _timeit(lambda a, b: hs_solve(a, b, rc.hs), (i1, i2), repeats)
        dt_tiled = _timeit(
            lambda a, b: hs_solve_tiled(
                a, b, rc.hs, mesh=mesh, halo_sweeps=rc.mesh.halo_sweeps
            ),
            (big1, big2),
            repeats,
        )
        out["weak_scaling"] = {
            "mesh": list(mesh_cfg.shape),
            "tile": [th, tw],
            "ms_single_tile": round(dt_one * 1e3, 3),
            "ms_tiled_full": round(dt_tiled * 1e3, 3),
            "efficiency": round(dt_one / dt_tiled, 4),
        }
    return out
