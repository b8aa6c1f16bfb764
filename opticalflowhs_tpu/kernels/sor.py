"""Fused Pallas 4-color SOR sweep kernel (cfg.solver="sor").

Successive over-relaxation under the (row%2, col%2) 4-coloring: no two
same-color pixels are HS-neighbors, so updating a color's pixels in
parallel while colors proceed sequentially IS a Gauss-Seidel ordering;
omega in (1, 2) over-relaxes it (Bruhn et al. 2005 used the same scheme
for variational flow). A sweep costs 4 neighborhood averages (vs 1 for
Jacobi) but converges in an order of magnitude fewer iterations at small
alpha — the wall-clock win is measured in tests/unit/test_sor.py and
docs/PERFORMANCE.md.

VMEM-resident whole-image kernel only (the class every driver config's
per-frame solve fits after batching/tiling); beyond-VMEM frames take the
jnp/XLA path — solver.sweeps routes. Exact twin of ops/stencils.sor_step
(same _navg association order, same u + omega*(u* - u) blend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.kernels.jacobi import (
    _LANE,
    _VMEM_BUDGET,
    _edge_masks,
    _navg,
    _round_up,
    _sublane,
    pad_to_tiles,
)

# SOR holds the Jacobi working set + 4 color masks + blend temporaries.
_SOR_ARRAYS = 21


def _sor_step(u, v, ex, ey, et, invd, masks, colors, omega):
    """One 4-color SOR sweep; association order mirrors stencils.sor_step."""
    for cm in colors:
        ubar = _navg(u, masks)
        vbar = _navg(v, masks)
        frac = (ex * ubar + ey * vbar + et) * invd
        un = ubar - ex * frac
        vn = vbar - ey * frac
        u = jnp.where(cm, u + omega * (un - u), u)
        v = jnp.where(cm, v + omega * (vn - v), v)
    return u, v


def _sor_vmem_kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref,
                     uo_ref, vo_ref, *, n_sweeps: int, h: int, w: int,
                     omega: float):
    ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
    hp, wp = ex.shape
    gr = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    aligned = (True, h == hp, True, w == wp)
    masks = _edge_masks(gr, gc, h, w, aligned)
    colors = tuple(
        (gr % 2 == pi) & (gc % 2 == pj) for pi in (0, 1) for pj in (0, 1)
    )
    uo_ref[...] = u0_ref[...]
    vo_ref[...] = v0_ref[...]

    def body(_, c):
        u, v = _sor_step(uo_ref[...], vo_ref[...], ex, ey, et, invd,
                         masks, colors, omega)
        uo_ref[...] = u
        vo_ref[...] = v
        return c

    jax.lax.fori_loop(0, n_sweeps, body, 0)


def _jnp_sor_sweeps(u, v, ex, ey, et, invd, n_sweeps, omega):
    """jnp oracle twin (stencils.sor_step loop); reverse-differentiable —
    the custom_vjp backward below rides its VJP, as in kernels/jacobi.py."""
    from opticalflowhs_tpu.ops import stencils

    colors = stencils.color_masks(*u.shape)

    def body(_, uv):
        return stencils.sor_step(uv[0], uv[1], ex, ey, et, invd, omega, colors)

    return jax.lax.fori_loop(0, n_sweeps, body, (u, v))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _sor_sweeps_ad(u, v, ex, ey, et, inv_den, n_sweeps, omega, interpret):
    return _sor_sweeps_impl(u, v, ex, ey, et, inv_den, n_sweeps, omega,
                            interpret)


def _sor_sweeps_ad_fwd(u, v, ex, ey, et, inv_den, n_sweeps, omega, interpret):
    out = _sor_sweeps_impl(u, v, ex, ey, et, inv_den, n_sweeps, omega,
                           interpret)
    return out, (u, v, ex, ey, et, inv_den)


def _sor_sweeps_ad_bwd(n_sweeps, omega, interpret, res, ct):
    u, v, ex, ey, et, inv_den = res
    _, vjp = jax.vjp(
        lambda *a: _jnp_sor_sweeps(*a, n_sweeps, omega),
        u, v, ex, ey, et, inv_den,
    )
    return vjp(ct)


_sor_sweeps_ad.defvjp(_sor_sweeps_ad_fwd, _sor_sweeps_ad_bwd)


def fits_vmem(h: int, w: int, dtype) -> bool:
    sub = _sublane(dtype)
    wp = _round_up(w, _LANE)
    nbytes = jnp.dtype(dtype).itemsize
    return _round_up(h, sub) * wp * nbytes * _SOR_ARRAYS <= _VMEM_BUDGET


def sor_sweeps(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n_sweeps: int,
    omega: float,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run n 4-color SOR sweeps on a VMEM-class frame; exact twin of the
    jnp sor_step loop. Caller checks fits_vmem first.

    Differentiable via the kernels/jacobi.py custom_vjp scheme: Mosaic
    kernel forward, jnp-twin VJP backward."""
    if u.ndim != 2:
        raise ValueError(f"sor_sweeps expects 2-D fields, got {u.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_sweeps == 0:
        return u, v
    return _sor_sweeps_ad(u, v, ex, ey, et, inv_den, n_sweeps, float(omega),
                          interpret)


def _sor_sweeps_impl(u, v, ex, ey, et, inv_den, n_sweeps, omega, interpret):
    h, w = u.shape
    sub = _sublane(u.dtype)
    hp = _round_up(h, sub)
    wp = _round_up(w, _LANE)
    args = [pad_to_tiles(a, hp, wp) for a in (ex, ey, et, inv_den, u, v)]
    out = jax.ShapeDtypeStruct((hp, wp), u.dtype)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    uo, vo = pl.pallas_call(
        functools.partial(
            _sor_vmem_kernel, n_sweeps=n_sweeps, h=h, w=w, omega=float(omega)
        ),
        out_shape=(out, out),
        in_specs=[spec] * 6,
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return uo[:h, :w], vo[:h, :w]
