"""Whole-solve fused pipeline: derivatives + ALL sweep blocks in 2 launches.

Motivation (tools/hw_fixed_cost.py): the banded solve's time splits into a
per-sweep marginal cost and a large per-SOLVE fixed cost — XLA data
marshalling around the kernels (slab concats for the 4 loop-invariant
fields, u/v pads, derivative-output crops and re-pads), the remainder
launch for iters % block_sweeps != 0, and per-launch dispatch. At 1080p
the fixed share is measured in *milliseconds* — a third of the whole
solve. This module removes nearly all of it:

  * Launch A — the banded derivative kernel (kernels/derivatives.py
    machinery) emits Ex/Ey/Et/inv_den already in the (hp, wp) padded
    band layout the sweep kernel wants: no crops, no re-pads.
  * Launch B — a megakernel over the (n_blocks, n_bands) grid (the
    round-2 `_sweeps_banded_fused` schedule) whose field halo slabs are
    **BlockSpec views of the same unpadded field arrays** with clamped
    index maps: top slab of band i = rows [i*band-sigma, i*band) is block
    (i*band/sigma - 1) of a (sigma, wp)-blocked view — legal whenever
    sigma | band, which the geometry picker guarantees. Zero XLA concats;
    Mosaic pipelines the fetches. Out-of-range clamped blocks (i=0 top,
    last bottom) hold rows the true-edge masks keep out of every true
    pixel, exactly like the arbitrary slab contents of the multi-launch
    path. u/v ping-pong between two HBM buffers by block parity with
    in-kernel DMA (as in `_sweeps_banded_fused`), and u = v = 0 initial
    state is written IN-KERNEL at block 0 (no zeros/pad materialization);
    warm starts DMA from a caller-padded buffer instead.
  * The geometry picker chooses block_sweeps s | n_sweeps (so there is
    no remainder launch) with sigma = round_up(s, sublane) | band; when
    no admissible (s, band) exists the caller falls back to the
    multi-launch path.

Same `_kernel_step` arithmetic and true-edge masks as every other sweep
kernel, so the jnp-oracle equivalence chain (SURVEY.md §4 rung 4) extends
through it; gradients ride a whole-solve custom_vjp (kernel forward,
jnp-twin backward), matching the scheme of kernels/jacobi.py.
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
    _kernel_step,
    _edge_masks,
    _round_up,
    _sublane,
    pad_to_tiles,
)

# Megakernel per-band working set: assembled window fields + u/v windows +
# step temporaries. Slightly above the multi-launch path's 20 (two u/v
# window scratch buffers live across the whole launch).
_ARRAYS = 22
_MAX_S = 32  # sigma caps at 32 rows of redundant halo compute


# Geometry time model, calibrated on v5e (docs/PERFORMANCE.md): in-kernel
# sweep rate ~60 Gpx*sweeps/s and ~30 us of per-grid-step cost (window
# load/store DMA + step overhead). Only the RATIO matters for ranking.
_ROW_SWEEP_PS = 17          # ps per pixel-sweep
_STEP_PS = 30_000_000       # ps per grid step


def pick_geometry(h: int, wp: int, n_sweeps: int, dtype, s_cap: int):
    """Choose (s, rem, sigma, band, hp): sigma = round_up(s, sub) divides
    band, window (band + 2*sigma) rows fit the VMEM budget. A remainder
    rem = n_sweeps %% s > 0 runs as the grid's final block phase inside the
    SAME launch (pl.when on the block index), so s is unconstrained by
    divisibility. Candidates are ranked by a modeled solve time =
    redundant-inclusive compute (window rows x sweeps) + per-step fixed
    cost, which trades temporal-blocking depth (fewer passes) against
    halo redundancy and step count. Returns None when no admissible
    geometry exists (caller falls back to the multi-launch path)."""
    sub = _sublane(dtype)
    dtype_bytes = jnp.dtype(dtype).itemsize
    unit = wp * dtype_bytes * _ARRAYS
    cap = max(1, min(s_cap, _MAX_S, n_sweeps))
    best = None
    for s in range(8, cap + 1):
        n_full, rem = divmod(n_sweeps, s)
        if n_full == 0:
            continue
        sigma = _round_up(s, sub)
        # band: multiple of sigma, window fits VMEM, fewest bands (halo
        # fraction shrinks as bands grow).
        band_max = _VMEM_BUDGET // unit - 2 * sigma
        if band_max < sigma:
            continue
        h_units = -(-h // sigma)                 # height in sigma units
        bu_max = max(1, band_max // sigma)
        nb = -(-h_units // bu_max)               # fewest bands that fit
        units = -(-h_units // nb)                # even split
        band = units * sigma
        hp = band * nb
        n_blocks = n_full + (1 if rem else 0)
        steps = n_blocks * nb
        row_sweeps = (n_full * s + rem) * nb * (band + 2 * sigma)
        cost = row_sweeps * wp * _ROW_SWEEP_PS + steps * _STEP_PS
        if best is None or cost < best[0]:
            best = (cost, (s, rem, sigma, band, hp))
    return None if best is None else best[1]


def _mega_kernel(ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                 et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                 u0_ref, v0_ref, ua_ref, ub_ref, va_ref, vb_ref,
                 uw_ref, vw_ref, sems, *, s: int, rem: int, sigma: int,
                 band: int, h: int, w: int, aligned_lr: tuple,
                 zero_init: bool, n_full: int):
    k = pl.program_id(0)
    i = pl.program_id(1)
    win = band + 2 * sigma

    def move(pairs):
        dmas = [
            pltpu.make_async_copy(src, dst, sems.at[j])
            for j, (src, dst) in enumerate(pairs)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    def load(su_ref, sv_ref):
        move([(su_ref.at[pl.ds(i * band, win)], uw_ref),
              (sv_ref.at[pl.ds(i * band, win)], vw_ref)])

    if zero_init:
        @pl.when(k == 0)
        def _():
            uw_ref[...] = jnp.zeros_like(uw_ref)
            vw_ref[...] = jnp.zeros_like(vw_ref)
    else:
        @pl.when(k == 0)
        def _():
            load(u0_ref, v0_ref)

    @pl.when(jnp.logical_and(k > 0, k % 2 == 1))
    def _():
        load(ub_ref, vb_ref)       # block k-1 (even) wrote buffer B

    @pl.when(jnp.logical_and(k > 0, k % 2 == 0))
    def _():
        load(ua_ref, va_ref)       # block k-1 (odd) wrote buffer A

    def asm(band_ref, top_ref, bot_ref):
        return jnp.concatenate([top_ref[...], band_ref[...], bot_ref[...]],
                               axis=0)

    ex = asm(ex_ref, ext_ref, exb_ref)
    ey = asm(ey_ref, eyt_ref, eyb_ref)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)
    local = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 0)
    gr = i * band - sigma + local
    gc = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 1)
    masks = _edge_masks(gr, gc, h, w, (False, False) + aligned_lr)

    def run(ns):
        u = uw_ref[...]
        v = vw_ref[...]
        for _k in range(ns):
            u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
        uw_ref[...] = u
        vw_ref[...] = v

    if rem == 0:
        run(s)
    else:
        # remainder phase: the grid's final block runs rem (< s) sweeps
        @pl.when(k < n_full)
        def _():
            run(s)

        @pl.when(k == n_full)
        def _():
            run(rem)

    def store(du_ref, dv_ref):
        move([(uw_ref.at[pl.ds(sigma, band)],
               du_ref.at[pl.ds(sigma + i * band, band)]),
              (vw_ref.at[pl.ds(sigma, band)],
               dv_ref.at[pl.ds(sigma + i * band, band)])])

    @pl.when(k % 2 == 0)
    def _():
        store(ub_ref, vb_ref)

    @pl.when(k % 2 == 1)
    def _():
        store(ua_ref, va_ref)


def sweeps_fused_v2(ex, ey, et, invd, n_sweeps, s, rem, sigma, band, h, w,
                    interpret, u0=None, v0=None):
    """All n_sweeps on (hp, wp) padded field arrays in ONE launch.

    Preconditions (pick_geometry): n_sweeps = (n_full * s) + rem with
    rem < s run by the grid's final block phase; sigma = round_up(s, sub)
    divides band; hp = arrays' row count is a multiple of band. u0/v0 are
    optional (hp, wp) warm-start fields; None means u = v = 0, written
    in-kernel at block 0.
    """
    hp, wp = ex.shape
    nb = hp // band
    n_full = (n_sweeps - rem) // s
    n_blocks = n_full + (1 if rem else 0)
    r = band // sigma                      # sigma-blocks per band
    zero_init = u0 is None
    aligned_lr = (True, w == wp)

    band_spec = pl.BlockSpec((band, wp), lambda k, i: (i, 0),
                             memory_space=pltpu.VMEM)
    # Halo-slab views of the SAME field arrays: top slab of band i starts
    # at element row i*band - sigma = sigma-block i*r - 1 (clamped to 0 for
    # i=0 — content is beyond the true top edge, mask-protected); bottom
    # slab starts at (i+1)*band = sigma-block (i+1)*r (clamped to the last
    # block for the final band — beyond the true bottom edge).
    top_spec = pl.BlockSpec(
        (sigma, wp),
        lambda k, i: (jnp.maximum(i * r - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (sigma, wp),
        lambda k, i: (jnp.minimum((i + 1) * r, nb * r - 1), 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    buf = jax.ShapeDtypeStruct((hp + 2 * sigma, wp), ex.dtype)
    if zero_init:
        # minimal (one sublane tile) stand-ins: the kernel never reads them
        u0p = jnp.zeros((8, wp), ex.dtype)
        v0p = u0p
    else:
        u0p = jnp.pad(u0, ((sigma, sigma), (0, 0)))  # (hp, wp) from caller
        v0p = jnp.pad(v0, ((sigma, sigma), (0, 0)))
    ua, ub, va, vb = pl.pallas_call(
        functools.partial(_mega_kernel, s=s, rem=rem, sigma=sigma, band=band,
                          h=h, w=w, aligned_lr=aligned_lr,
                          zero_init=zero_init, n_full=n_full),
        grid=(n_blocks, nb),
        out_shape=(buf, buf, buf, buf),
        in_specs=[band_spec, top_spec, bot_spec] * 4 + [any_spec] * 2,
        out_specs=(any_spec,) * 4,
        scratch_shapes=[
            pltpu.VMEM((band + 2 * sigma, wp), ex.dtype),
            pltpu.VMEM((band + 2 * sigma, wp), ex.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ex, ex, ex, ey, ey, ey, et, et, et, invd, invd, invd, u0p, v0p)
    uf, vf = (ub, vb) if n_blocks % 2 == 1 else (ua, va)
    return uf[sigma : sigma + hp], vf[sigma : sigma + hp]


# -- whole-solve orchestration -------------------------------------------------


from opticalflowhs_tpu.kernels.jacobi import _VMEM_ARRAYS as _VMEM_ARRAYS_WHOLE


def applicable(i1, n_sweeps: int, s_cap: int):
    """The fused pipeline targets the banded (beyond-VMEM) class; returns
    the geometry tuple or None (caller falls back to the classic path)."""
    if i1.ndim != 2 or n_sweeps < 2:
        return None
    h, w = i1.shape
    sub = _sublane(i1.dtype)
    wp = _round_up(w, _LANE)
    nbytes = jnp.dtype(i1.dtype).itemsize
    if _round_up(h, sub) * wp * nbytes * _VMEM_ARRAYS_WHOLE <= _VMEM_BUDGET:
        return None  # whole-image VMEM residency is already one launch
    return pick_geometry(h, wp, n_sweeps, i1.dtype, s_cap)


def _solve_impl(i1, i2, u0, v0, alpha, n_sweeps, variant, geom, interpret):
    from opticalflowhs_tpu.kernels.derivatives import _derivatives_impl

    h, w = i1.shape
    s, rem, sigma, band, hp = geom
    ex, ey, et, invd = _derivatives_impl(
        i1, i2, alpha, variant, interpret, band=band, hp_out=hp, crop=False
    )
    wp = ex.shape[1]
    if u0 is not None:
        # one combined pad straight to (hp, wp); sweeps_fused_v2 adds the
        # sigma rows (kept there so its contract is uniform for callers
        # that already hold padded fields)
        u0 = pad_to_tiles(u0, hp, wp)
        v0 = pad_to_tiles(v0, hp, wp)
    u, v = sweeps_fused_v2(
        ex, ey, et, invd, n_sweeps, s, rem, sigma, band, h, w, interpret,
        u0=u0, v0=v0,
    )
    return u[:h, :w], v[:h, :w]


def _jnp_twin(i1, i2, u0, v0, alpha, n_sweeps, variant):
    """Whole-solve jnp twin for the backward pass: composes the SAME
    canonical twins the other backends' VJPs use (kernel == oracle
    invariant, CLAUDE.md), so a stencil change propagates everywhere."""
    from opticalflowhs_tpu.kernels.derivatives import _jnp_deriv_twin
    from opticalflowhs_tpu.kernels.jacobi import _jnp_sweeps

    ex, ey, et, invd = _jnp_deriv_twin(i1, i2, alpha, variant)
    if u0 is None:
        u0 = jnp.zeros_like(ex)
        v0 = jnp.zeros_like(ex)
    return _jnp_sweeps(u0, v0, ex, ey, et, invd, n_sweeps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _solve_zero_ad(i1, i2, alpha, n_sweeps, variant, geom, interpret):
    return _solve_impl(i1, i2, None, None, alpha, n_sweeps, variant, geom,
                       interpret)


def _solve_zero_fwd(i1, i2, alpha, n_sweeps, variant, geom, interpret):
    out = _solve_impl(i1, i2, None, None, alpha, n_sweeps, variant, geom,
                      interpret)
    return out, (i1, i2)


def _solve_zero_bwd(alpha, n_sweeps, variant, geom, interpret, res, ct):
    i1, i2 = res
    _, vjp = jax.vjp(
        lambda a, b: _jnp_twin(a, b, None, None, alpha, n_sweeps, variant),
        i1, i2,
    )
    return vjp(ct)


_solve_zero_ad.defvjp(_solve_zero_fwd, _solve_zero_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _solve_warm_ad(i1, i2, u0, v0, alpha, n_sweeps, variant, geom, interpret):
    return _solve_impl(i1, i2, u0, v0, alpha, n_sweeps, variant, geom,
                       interpret)


def _solve_warm_fwd(i1, i2, u0, v0, alpha, n_sweeps, variant, geom, interpret):
    out = _solve_impl(i1, i2, u0, v0, alpha, n_sweeps, variant, geom,
                      interpret)
    return out, (i1, i2, u0, v0)


def _solve_warm_bwd(alpha, n_sweeps, variant, geom, interpret, res, ct):
    i1, i2, u0, v0 = res
    _, vjp = jax.vjp(
        lambda a, b, u, v: _jnp_twin(a, b, u, v, alpha, n_sweeps, variant),
        i1, i2, u0, v0,
    )
    return vjp(ct)


_solve_warm_ad.defvjp(_solve_warm_fwd, _solve_warm_bwd)


# -- batched twin (config-2/4 video stacks) ------------------------------------


def _mega_kernel_b(ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                   et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                   ua_ref, ub_ref, va_ref, vb_ref,
                   uw_ref, vw_ref, sems, *, s: int, rem: int, sigma: int,
                   band: int, h: int, w: int, aligned_lr: tuple,
                   n_full: int):
    """Batched _mega_kernel: grid (n_blocks, B, n_bands), zero-init only
    (the batch entry always starts from u = v = 0)."""
    k = pl.program_id(0)
    b = pl.program_id(1)
    i = pl.program_id(2)
    win = band + 2 * sigma

    def move(pairs):
        dmas = [
            pltpu.make_async_copy(src, dst, sems.at[j])
            for j, (src, dst) in enumerate(pairs)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    def load(su_ref, sv_ref):
        move([(su_ref.at[b, pl.ds(i * band, win)], uw_ref),
              (sv_ref.at[b, pl.ds(i * band, win)], vw_ref)])

    @pl.when(k == 0)
    def _():
        uw_ref[...] = jnp.zeros_like(uw_ref)
        vw_ref[...] = jnp.zeros_like(vw_ref)

    @pl.when(jnp.logical_and(k > 0, k % 2 == 1))
    def _():
        load(ub_ref, vb_ref)

    @pl.when(jnp.logical_and(k > 0, k % 2 == 0))
    def _():
        load(ua_ref, va_ref)

    def asm(band_ref, top_ref, bot_ref):
        return jnp.concatenate([top_ref[0], band_ref[0], bot_ref[0]], axis=0)

    ex = asm(ex_ref, ext_ref, exb_ref)
    ey = asm(ey_ref, eyt_ref, eyb_ref)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)
    local = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 0)
    gr = i * band - sigma + local
    gc = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 1)
    masks = _edge_masks(gr, gc, h, w, (False, False) + aligned_lr)

    def run(ns):
        u = uw_ref[...]
        v = vw_ref[...]
        for _k in range(ns):
            u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
        uw_ref[...] = u
        vw_ref[...] = v

    if rem == 0:
        run(s)
    else:
        @pl.when(k < n_full)
        def _():
            run(s)

        @pl.when(k == n_full)
        def _():
            run(rem)

    def store(du_ref, dv_ref):
        move([(uw_ref.at[pl.ds(sigma, band)],
               du_ref.at[b, pl.ds(sigma + i * band, band)]),
              (vw_ref.at[pl.ds(sigma, band)],
               dv_ref.at[b, pl.ds(sigma + i * band, band)])])

    @pl.when(k % 2 == 0)
    def _():
        store(ub_ref, vb_ref)

    @pl.when(k % 2 == 1)
    def _():
        store(ua_ref, va_ref)


def _solve_impl_batched(i1, i2, alpha, n_sweeps, variant, geom, interpret):
    from opticalflowhs_tpu.kernels.derivatives import _derivatives_impl

    bsz, h, w = i1.shape
    s, rem, sigma, band, hp = geom
    ex, ey, et, invd = _derivatives_impl(
        i1, i2, alpha, variant, interpret, band=band, hp_out=hp, crop=False
    )
    wp = ex.shape[2]
    nb = hp // band
    n_full = (n_sweeps - rem) // s
    n_blocks = n_full + (1 if rem else 0)
    r = band // sigma
    aligned_lr = (True, w == wp)

    band_spec = pl.BlockSpec((1, band, wp), lambda k, b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec(
        (1, sigma, wp),
        lambda k, b, i: (b, jnp.maximum(i * r - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, sigma, wp),
        lambda k, b, i: (b, jnp.minimum((i + 1) * r, nb * r - 1), 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    buf = jax.ShapeDtypeStruct((bsz, hp + 2 * sigma, wp), ex.dtype)
    ua, ub, va, vb = pl.pallas_call(
        functools.partial(_mega_kernel_b, s=s, rem=rem, sigma=sigma,
                          band=band, h=h, w=w, aligned_lr=aligned_lr,
                          n_full=n_full),
        grid=(n_blocks, bsz, nb),
        out_shape=(buf, buf, buf, buf),
        in_specs=[band_spec, top_spec, bot_spec] * 4,
        out_specs=(any_spec,) * 4,
        scratch_shapes=[
            pltpu.VMEM((band + 2 * sigma, wp), ex.dtype),
            pltpu.VMEM((band + 2 * sigma, wp), ex.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ex, ex, ex, ey, ey, ey, et, et, et, invd, invd, invd)
    uf, vf = (ub, vb) if n_blocks % 2 == 1 else (ua, va)
    return uf[:, sigma : sigma + h, :w], vf[:, sigma : sigma + h, :w]


def _jnp_twin_batched(i1, i2, alpha, n_sweeps, variant):
    return jax.vmap(
        lambda a, b: _jnp_twin(a, b, None, None, alpha, n_sweeps, variant)
    )(i1, i2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _solve_batched_ad(i1, i2, alpha, n_sweeps, variant, geom, interpret):
    return _solve_impl_batched(i1, i2, alpha, n_sweeps, variant, geom,
                               interpret)


def _solve_batched_fwd(i1, i2, alpha, n_sweeps, variant, geom, interpret):
    out = _solve_impl_batched(i1, i2, alpha, n_sweeps, variant, geom,
                              interpret)
    return out, (i1, i2)


def _solve_batched_bwd(alpha, n_sweeps, variant, geom, interpret, res, ct):
    i1, i2 = res
    _, vjp = jax.vjp(
        lambda a, b: _jnp_twin_batched(a, b, alpha, n_sweeps, variant),
        i1, i2,
    )
    return vjp(ct)


_solve_batched_ad.defvjp(_solve_batched_fwd, _solve_batched_bwd)


def hs_solve_fused_batched(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    alpha: float,
    n_sweeps: int,
    variant: str = "hs_cube",
    s_cap: int = 0,
    interpret: bool | None = None,
):
    """Batched whole-solve fused pipeline for (B, H, W) stacks whose frames
    are banded-class (HD+); returns (u, v) or None (caller falls back —
    sub-HD frames take the stacked-VMEM batched kernel, which is already
    one launch)."""
    if i1.ndim != 3 or i1.shape[0] == 0 or n_sweeps < 2:
        return None
    from opticalflowhs_tpu.kernels.jacobi import _BATCH_IMG_BYTES

    bsz, h, w = i1.shape
    sub = _sublane(i1.dtype)
    wp = _round_up(w, _LANE)
    nbytes = jnp.dtype(i1.dtype).itemsize
    if _round_up(h, sub) * wp * nbytes <= _BATCH_IMG_BYTES:
        return None  # stacked-VMEM class
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    geom = pick_geometry(h, wp, n_sweeps, i1.dtype, s_cap if s_cap > 0 else _MAX_S)
    if geom is None:
        return None
    return _solve_batched_ad(i1, i2, float(alpha), n_sweeps, variant, geom,
                             interpret)


def hs_solve_fused(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    alpha: float,
    n_sweeps: int,
    variant: str = "hs_cube",
    s_cap: int = 0,
    u0: jnp.ndarray | None = None,
    v0: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Whole HS solve (derivatives + n sweeps) in two Pallas launches.

    Returns (u, v), or None when the fused pipeline does not apply
    (VMEM-class frame, batched input, s_cap < 8 — block sweeps below 8
    drown in per-step overhead — or no admissible block geometry); the
    caller then takes the classic precompute+sweeps path. Exact twin
    of that path (same kernels' arithmetic); differentiable via a
    whole-solve custom_vjp against the jnp stencil twin.
    """
    if (u0 is None) != (v0 is None):
        raise ValueError("u0 and v0 must be given together")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    geom = applicable(i1, n_sweeps, s_cap if s_cap > 0 else _MAX_S)
    if geom is None:
        return None
    alpha = float(alpha)
    if u0 is None:
        return _solve_zero_ad(i1, i2, alpha, n_sweeps, variant, geom,
                              interpret)
    return _solve_warm_ad(i1, i2, u0, v0, alpha, n_sweeps, variant, geom,
                          interpret)
