"""Fused Pallas 4-color SOR sweep kernel (cfg.solver="sor").

Successive over-relaxation under the (row%2, col%2) 4-coloring: no two
same-color pixels are HS-neighbors, so updating a color's pixels in
parallel while colors proceed sequentially IS a Gauss-Seidel ordering;
omega in (1, 2) over-relaxes it (Bruhn et al. 2005 used the same scheme
for variational flow). A sweep costs 4 neighborhood averages (vs 1 for
Jacobi) but converges in an order of magnitude fewer iterations at small
alpha — the wall-clock win is measured in tests/unit/test_sor.py and
docs/PERFORMANCE.md.

Two strategies, routed by padded-image VMEM footprint exactly like the
Jacobi kernels: whole-image VMEM residency when it fits, else banded
temporal blocking whose halo slabs are 4*s rows per s-sweep launch (the
Gauss-Seidel halo decays one ring per COLOR STAGE, not per sweep). Exact
twin of ops/stencils.sor_step (same _navg association order, same
u + omega*(u* - u) blend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.kernels.jacobi import (
    _AUTO_BLOCK_SWEEPS,
    _LANE,
    _VMEM_BUDGET,
    _edge_masks,
    _navg,
    _pick_band,
    _round_up,
    _sublane,
    pad_to_tiles,
)

# SOR holds the Jacobi working set + 4 color masks + blend temporaries.
_SOR_ARRAYS = 21
_SOR_BAND_ARRAYS = 24


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


def _sor_vmem_kernel(r0_ref, c0_ref, ex_ref, ey_ref, et_ref, invd_ref,
                     u0_ref, v0_ref, uo_ref, vo_ref, *, n_sweeps: int,
                     h: int, w: int, omega: float, aligned: tuple):
    ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
    hp, wp = ex.shape
    # (r0, c0): global coordinates of array element (0, 0) — zero for whole
    # images, the halo-padded tile origin for the distributed path. Both
    # the clamp masks AND the color parity key off global coordinates.
    gr = r0_ref[0] + jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    gc = c0_ref[0] + jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    masks = _edge_masks(gr, gc, h, w, aligned)
    colors = _color_grids(gr, gc)
    uo_ref[...] = u0_ref[...]
    vo_ref[...] = v0_ref[...]

    def body(_, c):
        u, v = _sor_step(uo_ref[...], vo_ref[...], ex, ey, et, invd,
                         masks, colors, omega)
        uo_ref[...] = u
        vo_ref[...] = v
        return c

    jax.lax.fori_loop(0, n_sweeps, body, 0)


def _color_grids(gr, gc):
    """Four 2x2-parity masks from GLOBAL row/col index grids (twin of
    ops.stencils.color_masks, kernel side)."""
    return tuple(
        (gr % 2 == pi) & (gc % 2 == pj) for pi in (0, 1) for pj in (0, 1)
    )


# -- banded temporal blocking (HD+ frames beyond whole-image VMEM) ------------
#
# Same row-band schedule as kernels/jacobi._sweeps_banded, with one
# SOR-specific constant: the halo decays one ring per COLOR STAGE (a stage
# reads pixels its predecessors updated this sweep), so s sweeps per launch
# need a 4*s-row halo slab where Jacobi needs s. Everything else — slab
# assembly, true-edge masks from global coordinates, out-ref loop state —
# is the proven Jacobi scheme.


def _pick_band_sor(h: int, wp: int, dtype_bytes: int, sub: int, s: int) -> int:
    halo = _round_up(4 * max(1, s), sub)
    unit = wp * dtype_bytes * _SOR_BAND_ARRAYS
    band_max = max(2 * sub, _VMEM_BUDGET // unit - 2 * halo)
    h_units = -(-h // sub)
    bu_max = max(2, band_max // sub)
    nb = -(-h_units // bu_max)
    units = -(-h_units // nb)
    return units * sub


def _sor_banded_kernel(r0_ref, c0_ref, u_ref, ut_ref, ub_ref, v_ref, vt_ref,
                       vb_ref, ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref,
                       eyb_ref, et_ref, ett_ref, etb_ref, invd_ref,
                       invdt_ref, invdb_ref, uo_ref, vo_ref, *, s: int,
                       halo: int, band: int, h: int, w: int, omega: float,
                       aligned_lr: tuple):
    i = pl.program_id(0)

    def asm(band_ref, top_ref, bot_ref):
        return jnp.concatenate([top_ref[0], band_ref[...], bot_ref[0]], axis=0)

    u = asm(u_ref, ut_ref, ub_ref)
    v = asm(v_ref, vt_ref, vb_ref)
    ex = asm(ex_ref, ext_ref, exb_ref)
    ey = asm(ey_ref, eyt_ref, eyb_ref)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)

    th, wp = u.shape  # (band + 2*halo, Wp); halo >= 4*s (sublane-rounded)
    gr = (r0_ref[0] + i * band - halo
          + jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0))
    gc = c0_ref[0] + jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1)
    masks = _edge_masks(gr, gc, h, w, (False, False) + aligned_lr)
    colors = _color_grids(gr, gc)
    for _k in range(s):
        u, v = _sor_step(u, v, ex, ey, et, invd, masks, colors, omega)
    uo_ref[...] = u[halo : halo + band]
    vo_ref[...] = v[halo : halo + band]


def _sor_banded_block(u, v, ex, ey, et, invd, inv_slabs, s, halo, band,
                      h, w, omega, interpret, row0, col0, aligned_lr):
    hp, wp = u.shape
    nb = hp // band

    def slabs(x):
        b = x.reshape(nb, band, wp)
        top = jnp.concatenate(
            [b[:1, band - halo:], b[:-1, band - halo:]], axis=0
        )
        bot = jnp.concatenate([b[1:, :halo], b[-1:, :halo]], axis=0)
        return top, bot

    ut, ub = slabs(u)
    vt, vb = slabs(v)
    (ext, exb), (eyt, eyb), (ett, etb), (invdt, invdb) = inv_slabs

    band_spec = pl.BlockSpec((band, wp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, halo, wp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = jax.ShapeDtypeStruct((hp, wp), u.dtype)
    return pl.pallas_call(
        functools.partial(_sor_banded_kernel, s=s, halo=halo, band=band,
                          h=h, w=w, omega=omega, aligned_lr=aligned_lr),
        grid=(nb,),
        out_shape=(out, out),
        in_specs=[sspec, sspec] + [band_spec, slab_spec, slab_spec] * 6,
        out_specs=(band_spec, band_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(row0, jnp.int32).reshape(1),
      jnp.asarray(col0, jnp.int32).reshape(1),
      u, ut, ub, v, vt, vb, ex, ext, exb, ey, eyt, eyb,
      et, ett, etb, invd, invdt, invdb)


def _sor_sweeps_banded(u, v, ex, ey, et, invd, n_sweeps, s, band, h, w,
                       omega, interpret, row0=0, col0=0, aligned_lr=None):
    hp, wp = u.shape
    nb = hp // band
    halo = _round_up(4 * s, _sublane(u.dtype))
    if aligned_lr is None:
        aligned_lr = (True, w == wp)

    def inv_slab(x):
        b = x.reshape(nb, band, wp)
        return (
            jnp.concatenate(
                [b[:1, band - halo:], b[:-1, band - halo:]], axis=0
            ),
            jnp.concatenate([b[1:, :halo], b[-1:, :halo]], axis=0),
        )

    inv_slabs = tuple(inv_slab(a) for a in (ex, ey, et, invd))

    def block(uv, k):
        return _sor_banded_block(
            uv[0], uv[1], ex, ey, et, invd, inv_slabs, k, halo, band, h, w,
            omega, interpret, row0, col0, aligned_lr,
        )

    n_blocks, rem = divmod(n_sweeps, s)
    uv = (u, v)
    if n_blocks:
        uv = jax.lax.fori_loop(0, n_blocks, lambda _, x: block(x, s), uv)
    if rem:
        uv = block(uv, rem)
    return uv


def _jnp_sor_sweeps(u, v, ex, ey, et, invd, n_sweeps, omega):
    """jnp oracle twin (stencils.sor_step loop); reverse-differentiable —
    the custom_vjp backward below rides its VJP, as in kernels/jacobi.py.
    sqrt(n)-checkpointed for O(sqrt(n)) gradient memory."""
    from opticalflowhs_tpu.ops import stencils

    colors = stencils.color_masks(*u.shape)

    return stencils.checkpointed_loop(
        lambda uv: stencils.sor_step(
            uv[0], uv[1], ex, ey, et, invd, omega, colors
        ),
        (u, v), n_sweeps,
    )


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
    if fits_vmem(h, w, u.dtype):
        sub = _sublane(u.dtype)
        hp = _round_up(h, sub)
        wp = _round_up(w, _LANE)
        aligned = (True, h == hp, True, w == wp)
        uo, vo = _sor_vmem_call(
            u, v, ex, ey, et, inv_den, n_sweeps, omega, interpret,
            hp, wp, 0, 0, h, w, aligned,
        )
    else:
        uo, vo = _sor_sweeps_beyond_vmem(
            u, v, ex, ey, et, inv_den, n_sweeps, omega, interpret
        )
    return uo[:h, :w], vo[:h, :w]


def _sor_vmem_call(u, v, ex, ey, et, inv_den, n_sweeps, omega, interpret,
                   hp, wp, row0, col0, h, w, aligned):
    args = [pad_to_tiles(a, hp, wp) for a in (ex, ey, et, inv_den, u, v)]
    out = jax.ShapeDtypeStruct((hp, wp), u.dtype)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(
            _sor_vmem_kernel, n_sweeps=n_sweeps, h=h, w=w,
            omega=float(omega), aligned=aligned,
        ),
        out_shape=(out, out),
        in_specs=[sspec, sspec] + [spec] * 6,
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.asarray(row0, jnp.int32).reshape(1),
      jnp.asarray(col0, jnp.int32).reshape(1), *args)


def sor_tile_sweeps(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n_sweeps: int,
    omega: float,
    row0,
    col0,
    h: int,
    w: int,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SOR twin of kernels.jacobi.tile_sweeps: n sweeps on one chip's
    halo-padded tile, clamp masks AND color parity keyed to the traced
    global origin (row0, col0). The caller guarantees halo width >=
    4*n_sweeps (one decay ring per color stage). Whole-tile VMEM residency
    when it fits, else the banded kernel with the same global origin."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_sweeps == 0:
        return u, v
    omega = float(omega)
    th, tw = u.shape
    sub = _sublane(u.dtype)
    wp = _round_up(tw, _LANE)
    nbytes = jnp.dtype(u.dtype).itemsize
    hp = _round_up(th, sub)
    if hp * wp * nbytes * _SOR_ARRAYS > _VMEM_BUDGET:
        s = max(1, min(n_sweeps, _AUTO_BLOCK_SWEEPS // 4))
        band = _pick_band_sor(th, wp, nbytes, sub, s)
        s = max(1, min(s, band // 8))
        hp = _round_up(th, band)
        args = [pad_to_tiles(a, hp, wp) for a in (u, v, ex, ey, et, inv_den)]
        uo, vo = _sor_sweeps_banded(
            *args, n_sweeps, s, band, h, w, omega, interpret,
            row0=row0, col0=col0, aligned_lr=(False, False),
        )
        return uo[:th, :tw], vo[:th, :tw]
    uo, vo = _sor_vmem_call(
        u, v, ex, ey, et, inv_den, n_sweeps, omega, interpret,
        hp, wp, row0, col0, h, w, (False, False, False, False),
    )
    return uo[:th, :tw], vo[:th, :tw]


def _sor_sweeps_beyond_vmem(u, v, ex, ey, et, inv_den, n_sweeps, omega,
                            interpret):
    """HD+ frames: banded temporal blocking with 4*s-row halo slabs."""
    h, w = u.shape
    sub = _sublane(u.dtype)
    wp = _round_up(w, _LANE)
    nbytes = jnp.dtype(u.dtype).itemsize
    # Fewer sweeps per launch than Jacobi's 16: the halo slab (and its
    # redundant compute) is 4x wider per sweep.
    s = max(1, min(n_sweeps, _AUTO_BLOCK_SWEEPS // 4))
    band = _pick_band_sor(h, wp, nbytes, sub, s)
    s = max(1, min(s, band // 8))  # keep halo = 4*s within half the band
    hp = _round_up(h, band)
    args = [pad_to_tiles(a, hp, wp) for a in (u, v, ex, ey, et, inv_den)]
    return _sor_sweeps_banded(
        *args, n_sweeps, s, band, h, w, float(omega), interpret
    )
