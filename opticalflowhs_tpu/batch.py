"""Batched / data-parallel flow over frame pairs (component N6; SURVEY.md §2b P1).

Driver config 2: batched HS over a video sequence. The batch axis is pure
data parallelism — no cross-shard communication during the solve — realized
as `vmap` inside jit, optionally laid out over the "batch" mesh axis with a
`NamedSharding` so XLA runs each chip's sub-batch locally (SURVEY.md §3.4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opticalflowhs_tpu.config import HSConfig, PyramidConfig
from opticalflowhs_tpu.pyramid import _pyramid_body
from opticalflowhs_tpu.solver import Flow, precompute, sweeps, sweeps_until


def solve_level_batched(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig,
    iters: int,
    stacked_ok: bool = True,
) -> Flow:
    """One fixed-budget zero-init solve on a (B, H, W) stack with the full
    batched routing chain — the batch twin of solver.solve_level, shared by
    `_batched_solve_impl` and the batched pyramid's level solves.

    The stacked/batched kernels flatten or grid over the batch with
    VMEM-derived boundaries — correct on one device, but they would defeat
    a P("batch") mesh sharding (GSPMD would gather the whole batch per
    chunk). Mesh-sharded stacks pass stacked_ok=False and take the vmap
    path, which GSPMD splits per chip with zero collectives.
    """
    from opticalflowhs_tpu.solver import resolve_backend

    if (
        stacked_ok
        and cfg.solver == "jacobi"  # SOR takes the vmap path below
        and resolve_backend(cfg.backend) == "pallas"
    ):
        import os

        from opticalflowhs_tpu.solver import fused_solve_enabled

        from opticalflowhs_tpu.solver import resident_solve_enabled

        if (
            cfg.tol == 0  # fixed sweep schedule baked into the launch
            and resident_solve_enabled(iters, batched=True)
            and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
        ):
            # Batched VMEM-resident pipeline (kernels/solve_resident.py):
            # grid over frames, one full resident solve per frame in a
            # single launch; None outside its class (sub-HD or beyond
            # residency).
            from opticalflowhs_tpu.kernels.solve_resident import (
                hs_solve_resident_batched,
            )

            dtype = jnp.dtype(cfg.dtype)
            out = hs_solve_resident_batched(
                i1.astype(dtype), i2.astype(dtype), cfg.alpha, iters,
                cfg.deriv_variant,
            )
            if out is not None:
                return Flow(*out)
        from opticalflowhs_tpu.solver import skewed_solve_enabled

        if (
            cfg.tol == 0
            and skewed_solve_enabled(iters, batched=True)
            and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
        ):
            # Batched u/v-resident time-skewed kernel for beyond-residency
            # (B x 4K) stacks; None outside its class. Off in auto — the
            # batched-banded grid measured faster (see skewed_solve_enabled).
            from opticalflowhs_tpu.kernels.solve_skewed import (
                hs_solve_skewed_batched,
            )

            dtype = jnp.dtype(cfg.dtype)
            out = hs_solve_skewed_batched(
                i1.astype(dtype), i2.astype(dtype), cfg.alpha, iters,
                cfg.deriv_variant,
            )
            if out is not None:
                return Flow(*out)
        if (
            cfg.tol == 0  # the fused pipeline bakes a fixed sweep schedule
            and fused_solve_enabled(iters, batched=True)
            and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
        ):
            # Batched whole-solve fused pipeline (kernels/solve_fused.py):
            # derivatives + every sweep block in two launches for HD+
            # frames; None for the stacked-VMEM class below.
            from opticalflowhs_tpu.kernels.solve_fused import (
                hs_solve_fused_batched,
            )

            dtype = jnp.dtype(cfg.dtype)
            out = hs_solve_fused_batched(
                i1.astype(dtype), i2.astype(dtype), cfg.alpha, iters,
                cfg.deriv_variant, s_cap=cfg.block_sweeps,
            )
            if out is not None:
                return Flow(*out)
        # Batched fused kernel: the whole stack in one (B*Hp, Wp) array so
        # per-op dispatch cost amortizes over the batch (kernels/jacobi.py).
        from opticalflowhs_tpu.kernels.jacobi import jacobi_sweeps_batched

        ex, ey, et, inv_den = precompute(i1, i2, cfg)  # stencils batch-aware
        u = jnp.zeros_like(ex)
        v = jnp.zeros_like(ex)
        if cfg.tol > 0:
            # Batch-global solve-to-tolerance around the stacked kernel:
            # sweeps_until supplies the stop semantics, the stacked kernel
            # runs each check block (max update over the WHOLE stack).
            return sweeps_until(
                u, v, ex, ey, et, inv_den, cfg, budget=iters,
                run_block=lambda uu, vv, nn: jacobi_sweeps_batched(
                    uu, vv, ex, ey, et, inv_den, nn,
                    block_sweeps=cfg.block_sweeps,
                ),
            )
        uo, vo = jacobi_sweeps_batched(
            u, v, ex, ey, et, inv_den, iters, block_sweeps=cfg.block_sweeps
        )
        return Flow(uo, vo)

    def single(a, b):
        ex, ey, et, inv_den = precompute(a, b, cfg)
        u = jnp.zeros_like(ex)
        v = jnp.zeros_like(ex)
        if cfg.tol > 0:
            # vmapped while_loop -> global stop over the batch (runs until
            # the slowest element converges; converged lanes are no-ops).
            return sweeps_until(u, v, ex, ey, et, inv_den, cfg, budget=iters)
        return sweeps(u, v, ex, ey, et, inv_den, iters, cfg)

    return jax.vmap(single)(i1, i2)


@partial(jax.jit, static_argnames=("cfg", "stacked_ok"))
def _batched_solve_impl(
    i1: jnp.ndarray, i2: jnp.ndarray, cfg: HSConfig, stacked_ok: bool = True
) -> Flow:
    return solve_level_batched(i1, i2, cfg, cfg.iters, stacked_ok)


@partial(jax.jit, static_argnames=("cfg", "pyr", "stacked_ok"))
def _batched_pyramid_impl(
    i1, i2, cfg: HSConfig, pyr: PyramidConfig, stacked_ok: bool = True
) -> Flow:
    from typing import Optional, Sequence

    from opticalflowhs_tpu.pyramid import (
        gaussian_pyramid,
        upsample_flow,
        warp_bilinear,
        warp_bilinear_tiled,
    )
    from opticalflowhs_tpu.solver import resolve_backend

    if not (
        stacked_ok
        and cfg.solver == "jacobi"
        and resolve_backend(cfg.backend) == "pallas"
    ):
        # Mesh-sharded stacks and non-Jacobi solvers: vmap the single-pair
        # body (GSPMD splits the lanes per chip; whole_solve_ok=False — the
        # manual-DMA whole-solve kernels have no batching rule).
        return jax.vmap(
            lambda a, b: _pyramid_body(a, b, cfg, pyr, whole_solve_ok=False)
        )(i1, i2)

    # Batch-aware pyramid body: the per-level ops are batch-aware jnp, and
    # each level's zero-init residual solve rides the BATCHED whole-solve
    # chain (resident-batched / fused-batched / stacked kernels) — one
    # launch per level per stack instead of per frame.
    dtype = jnp.dtype(cfg.dtype)
    p1 = gaussian_pyramid(i1.astype(dtype), pyr.levels)
    p2 = gaussian_pyramid(i2.astype(dtype), pyr.levels)
    iters: Sequence[int] = pyr.iters_per_level or (cfg.iters,) * pyr.levels

    flow: Optional[Flow] = None
    for level in range(pyr.levels - 1, -1, -1):
        f1, f2 = p1[level], p2[level]
        if flow is None:
            f2w = f2
        else:
            flow = upsample_flow(flow, f1.shape[-2:])
            if pyr.warp == "gather":
                f2w = warp_bilinear(f2, flow.u, flow.v)
            else:
                f2w = jax.vmap(warp_bilinear_tiled)(f2, flow.u, flow.v)
        dflow = solve_level_batched(f1, f2w, cfg, iters[level], stacked_ok)
        if flow is None:
            flow = dflow
        else:
            flow = Flow(flow.u + dflow.u, flow.v + dflow.v)
    return flow


def hs_solve_batched(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig = HSConfig(),
    pyr: Optional[PyramidConfig] = None,
    mesh: Optional[Mesh] = None,
) -> Flow:
    """Solve flow for a (B, H, W) stack of frame pairs.

    With `mesh`, inputs are sharded P("batch", None, None) across its "batch"
    axis before the jitted solve — XLA then executes each shard's vmap lanes
    with zero collectives (SURVEY.md §2b P1).
    """
    if i1.ndim != 3:
        raise ValueError(f"expected (B, H, W) frame stacks, got {i1.shape}")
    if cfg.solver == "sor" and cfg.omega == 0.0:
        raise ValueError(
            "omega=0 (auto) is single-pair only — call solver.tune_omega on "
            "a representative pair and pass the result"
        )
    if mesh is not None:
        sharding = NamedSharding(mesh, P("batch", None, None))
        i1 = jax.device_put(i1, sharding)
        i2 = jax.device_put(i2, sharding)
    if pyr is not None and pyr.levels > 1:
        return _batched_pyramid_impl(i1, i2, cfg, pyr, stacked_ok=mesh is None)
    return _batched_solve_impl(i1, i2, cfg, stacked_ok=mesh is None)


def video_pairs(frames: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(T, H, W) video -> ((T-1, H, W), (T-1, H, W)) consecutive frame pairs."""
    if frames.ndim != 3:
        raise ValueError(f"expected (T, H, W) video, got {frames.shape}")
    return frames[:-1], frames[1:]
