"""Tiled multi-chip Horn-Schunck solve (component N7; SURVEY.md §3.5).

`shard_map` over a ("batch", "y", "x") mesh: each chip owns an image tile;
every halo block is 4 ppermutes (±y, ±x — two-phase, corners included) and s
local Jacobi sweeps. Jacobi's order-independence makes the tiled solve
*exactly* equivalent to the untiled one given correct halos (SURVEY.md §2.5)
— that invariant is asserted by tests/distributed/ at several mesh shapes.

Blockwise halo (halo_sweeps = s > 1) exchanges an s-px halo every s sweeps to
amortize ppermute latency over ICI/DCN: the halo ring decays one ring per
sweep while the owned tile stays exact (ring-attention-style blocking,
SURVEY.md §2b P4). Derivatives are computed once from frames exchanged with
an (s+1)-px halo — the +1 feeds the 2x2x2 forward-difference cube (§2.5 D).

Multi-host: the same code runs under `jax.distributed.initialize()` with one
process per host — see dist/multihost.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.dist.halo import halo_pad, replicate_global_edges, unpad
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.solver import Flow, resolve_backend


def _local_sweep_block(u, v, ex, ey, et, invd, n_sweeps: int, halo: int):
    """s sweeps on an s-halo-padded tile; global edges re-clamped per sweep."""

    def body(k, uv):
        uu, vv = uv
        uu = jnp.where(k > 0, replicate_global_edges(uu, halo), uu)
        vv = jnp.where(k > 0, replicate_global_edges(vv, halo), vv)
        return stencils.jacobi_step(uu, vv, ex, ey, et, invd)

    return lax.fori_loop(0, n_sweeps, body, (u, v))


def _tile_body(i1t: jnp.ndarray, i2t: jnp.ndarray, cfg: HSConfig, s: int) -> Flow:
    """Per-chip solve body; runs inside shard_map with y/x axes bound."""
    dtype = jnp.dtype(cfg.dtype)
    i1t = i1t.astype(dtype)
    i2t = i2t.astype(dtype)
    # Frames with (s+1)-px halo -> derivatives exact on the s-halo region.
    f1 = halo_pad(i1t, s + 1)
    f2 = halo_pad(i2t, s + 1)
    ex, ey, et = stencils.derivatives(f1, f2, cfg.deriv_variant)
    ex, ey, et = (unpad(a, 1) for a in (ex, ey, et))
    invd = 1.0 / (cfg.alpha * cfg.alpha + ex * ex + ey * ey)

    u = jnp.zeros_like(i1t)
    v = jnp.zeros_like(i1t)
    th, tw = i1t.shape
    use_pallas = resolve_backend(cfg.backend) == "pallas"
    if use_pallas:
        from opticalflowhs_tpu.kernels.jacobi import tile_sweeps

        h = th * lax.axis_size("y")
        w = tw * lax.axis_size("x")
        row0 = lax.axis_index("y") * th - s
        col0 = lax.axis_index("x") * tw - s

    def block(uv, n_sweeps):
        uu = halo_pad(uv[0], s)
        vv = halo_pad(uv[1], s)
        if use_pallas:
            # Per-chip fused Pallas sweeps; clamp at true global edges via
            # the tile's traced global offset (SURVEY.md §3.5 hot loop).
            uu, vv = tile_sweeps(
                uu, vv, ex, ey, et, invd, n_sweeps, row0, col0, h, w
            )
        else:
            uu, vv = _local_sweep_block(uu, vv, ex, ey, et, invd, n_sweeps, s)
        return unpad(uu, s), unpad(vv, s)

    n_full, rem = divmod(cfg.iters, s)
    if n_full > 0:
        u, v = lax.fori_loop(
            0, n_full, lambda _, uv: block(uv, s), (u, v)
        )
    if rem > 0:
        u, v = block((u, v), rem)
    return Flow(u, v)


@partial(jax.jit, static_argnames=("cfg", "s", "mesh", "batched"))
def _tiled_impl(i1, i2, cfg: HSConfig, s: int, mesh: Mesh, batched: bool):
    spec = P("batch", "y", "x") if batched else P("y", "x")
    body = _tile_body
    if batched:
        body = jax.vmap(_tile_body, in_axes=(0, 0, None, None))
    fn = jax.shard_map(
        lambda a, b: body(a, b, cfg, s),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=Flow(spec, spec),
        # pallas_call outputs carry no varying-mesh-axes metadata; skip the
        # vma check (correctness is asserted by the tiled==untiled tests).
        check_vma=False,
    )
    return fn(i1, i2)


def hs_solve_tiled(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig = HSConfig(),
    mesh: Optional[Mesh] = None,
    halo_sweeps: int = 1,
) -> Flow:
    """Solve HS flow with the image tiled over mesh axes ("y", "x").

    Accepts (H, W) single pairs or (B, H, W) stacks; stacks are additionally
    sharded over the "batch" axis (DP x TP composition, SURVEY.md §2b).
    H and W must divide evenly by the mesh's y and x sizes; tiles must be at
    least halo_sweeps+1 pixels on a side.
    """
    if mesh is None:
        raise ValueError("hs_solve_tiled requires a Mesh (dist.make_mesh)")
    if halo_sweeps < 1:
        raise ValueError("halo_sweeps must be >= 1")
    batched = i1.ndim == 3
    h, w = i1.shape[-2:]
    my = mesh.shape["y"]
    mx = mesh.shape["x"]
    if h % my or w % mx:
        raise ValueError(f"image {h}x{w} not divisible by spatial mesh {my}x{mx}")
    if batched and i1.shape[0] % mesh.shape["batch"]:
        raise ValueError(
            f"batch {i1.shape[0]} not divisible by mesh batch {mesh.shape['batch']}"
        )
    if h // my <= halo_sweeps or w // mx <= halo_sweeps:
        raise ValueError(
            f"tile {h // my}x{w // mx} too small for halo_sweeps={halo_sweeps}"
        )
    spec = P("batch", "y", "x") if batched else P("y", "x")
    sharding = NamedSharding(mesh, spec)
    i1 = jax.device_put(i1, sharding)
    i2 = jax.device_put(i2, sharding)
    return _tiled_impl(i1, i2, cfg, halo_sweeps, mesh, batched)
