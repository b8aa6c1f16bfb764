"""u/v-resident time-skewed whole-solve kernel for beyond-residency frames.

The VMEM-resident kernel (kernels/solve_resident.py) caps where its 8-array
working set (4 fields + 2 u/v ping-pong pairs) outgrows VMEM (~2.6 Mpx
fp32); beyond that the fused banded megakernel (kernels/solve_fused.py)
streams the u/v windows AND the field slabs from HBM every block. Its 4K
measured cost tracks the field stream: 16 B/px/sweep of Ex/Ey/Et/1-per-den
reads alone put the streaming bound at ~51 Gpx*sweeps/s (819/16).

This schedule covers the gap class — frames whose u and v arrays BOTH fit
VMEM even though the 8-array set does not (~2.6-11 Mpx fp32) — in AUTO
routing only its >= _MIN_PX = 6 Mpx slice (4K), where it beat the fused
pipeline; 1440p measured faster on fused (see _MIN_PX) —
with two ideas on top of the megakernel:

  * u and v live in VMEM scratch for the WHOLE solve (2 arrays, ~67 MB at
    4K): zero u/v HBM traffic, zero u/v window DMAs, and the update is
    IN-PLACE — no ping-pong pair, which is exactly what makes the class
    fit.
  * In-place Jacobi is made order-correct by time skewing: bands update
    top-to-bottom, and before band b overwrites its rows, the OLD (sweep
    k0) values of its last sigma rows are saved to a (sigma, wp) pencil
    scratch; band b+1's window reads [pencil // resident rows
    r0..r0+band+sigma) — all still sweep k0 — runs s in-register sweeps,
    and writes back only its central band rows (the outer rings decay one
    per sweep, ns <= sigma, the same order-independence argument as the
    banded megakernel). The pencil at band 0 holds stale rows that sit
    ABOVE the true top edge: mask-protected, never read by a true pixel,
    so no per-block pencil reset exists.
  * The four loop-invariant fields stream from HBM once per s sweeps as
    BlockSpec band+halo-slab VIEWS (the megakernel's zero-concat trick,
    sigma | band) — 16/s B/px/sweep; at s=8 the schedule is VPU-bound.

HBM traffic for an n-sweep solve: fields 16 B/px per s sweeps + frames
read once (derivative launch) + flow written once. The grid is
(n_blocks, nb) with the remainder rem = n %% s run by the final block
phase (pl.when), so any sweep count fits in ONE sweep launch plus the
derivative launch.

Same _kernel_step arithmetic and true-edge masks as every other sweep
kernel (kernel == jnp oracle invariant, CLAUDE.md); gradients ride the
whole-solve custom_vjp (kernel forward, jnp-twin backward) scheme shared
with kernels/solve_fused.py. Replaces the reference's per-iteration
relaunch loop (SURVEY.md §3.1 R4/R5) for the 4K class of driver config 5.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.kernels.jacobi import (
    _LANE,
    _edge_masks,
    _kernel_step,
    _round_up,
    _sublane,
    pad_to_tiles,
)
from opticalflowhs_tpu.kernels.solve_fused import _jnp_twin

# Window working set: 8 Pallas-pipelined field block buffers (4 fields x
# band/top/bot views, double-buffered) + ~10 _kernel_step temporaries.
_ARRAYS_WIN = 18
_MAX_S = 32
_LIMIT = int(os.environ.get("HSFLOW_SKEWED_VMEM", str(118 * 1024 * 1024)))
# Auto-class lower bound (px). Hardware A/B (tools/hw_skewed_ab.py,
# 2026-08-20, n=30 steady-state chains): skewed wins at 4K i100
# (13.93 ms / 60.0 Gpx*sweeps/s vs fused 14.38 / 58.1) where its zero
# u/v HBM traffic matters, but LOSES at 1440p (5.07 vs 4.81) where both
# schedules are Mosaic per-op-fixed-cost-bound and fused's geometry has
# fewer grid steps. Below this bound the fused pipeline keeps the class.
_MIN_PX = int(os.environ.get("HSFLOW_SKEWED_MIN_PX", str(6_000_000)))

# Ranking model, same constants family as solve_fused.pick_geometry: only
# the ratio matters. Per-step cost here is lower (no u/v window DMA).
_ROW_SWEEP_PS = 17
_STEP_PS = 20_000_000


def pick_geometry(h: int, w: int, n_sweeps: int, dtype, s_cap: int):
    """(s, rem, sigma, band, hp) or None. Constraints: sigma =
    round_up(s, sublane) divides band; 2 resident (hp+sigma, wp) arrays +
    the (band+2*sigma) window set + pencils fit the budget."""
    sub = _sublane(dtype)
    nbytes = jnp.dtype(dtype).itemsize
    wp = _round_up(w, _LANE)
    cap = max(1, min(s_cap, _MAX_S, n_sweeps))
    best = None
    for s in range(4, cap + 1):
        n_full, rem = divmod(n_sweeps, s)
        if n_full == 0:
            continue
        sigma = _round_up(s, sub)
        h_units = -(-h // sigma)
        geom = None
        for nb in range(1, h_units + 1):
            units = -(-h_units // nb)
            band = units * sigma
            hp = band * nb
            win = band + 2 * sigma
            resident = 2 * (hp + sigma) * wp * nbytes
            win_set = _ARRAYS_WIN * win * wp * nbytes
            pencil = 2 * sigma * wp * nbytes
            if resident + win_set + pencil <= _LIMIT:
                geom = (nb, band, hp, win)
                break  # fewest bands that fit
        if geom is None:
            continue
        nb, band, hp, win = geom
        n_blocks = n_full + (1 if rem else 0)
        steps = n_blocks * nb
        row_sweeps = (n_full * s + rem) * nb * win
        cost = row_sweeps * wp * _ROW_SWEEP_PS + steps * _STEP_PS
        if best is None or cost < best[0]:
            best = (cost, (s, rem, sigma, band, hp))
    return None if best is None else best[1]


def _skewed_body(bsel, ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                 et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                 u0_ref, v0_ref, uo_ref, vo_ref,
                 u_res, v_res, pu, pv, sems, *, s: int, rem: int,
                 sigma: int, band: int, hp: int, h: int, w: int,
                 aligned_lr: tuple, zero_init: bool, n_full: int,
                 n_blocks: int, k, i):
    """Shared solve body. bsel = the batch index (None when unbatched):
    field block refs then carry a leading length-1 batch dim and the HBM
    outputs are (B, hp, wp); the VMEM residents/pencils are reused across
    frames (each frame's k==0 block re-seeds them)."""
    r0 = i * band
    win = band + 2 * sigma

    def fref(ref):
        return ref[0] if bsel is not None else ref[...]

    def out_dst(ref, sl):
        return ref.at[bsel, sl] if bsel is not None else ref.at[sl]

    def move(pairs):
        dmas = [
            pltpu.make_async_copy(src, dst, sems.at[j])
            for j, (src, dst) in enumerate(pairs)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    if not zero_init:
        @pl.when(jnp.logical_and(k == 0, i == 0))
        def _():
            move([(u0_ref, u_res.at[pl.ds(0, hp)]),
                  (v0_ref, v_res.at[pl.ds(0, hp)])])

    # Window: sigma pencil rows (OLD rows r0-sigma..r0, saved by the
    # previous band before its in-place write) + band+sigma resident rows
    # [r0, r0+band+sigma) — still old, bands below are untouched. The
    # resident arrays carry sigma bottom pad rows so the read never runs
    # off the end; their content (and band 0's stale pencil) is beyond
    # the true edges and mask-protected.
    uw = jnp.concatenate([pu[...], u_res[pl.ds(r0, band + sigma)]], axis=0)
    vw = jnp.concatenate([pv[...], v_res[pl.ds(r0, band + sigma)]], axis=0)
    if zero_init:
        # sweep-0 state is all-zeros; the residents are uninitialized on
        # the first block, so select rather than read
        zmask = k == 0
        uw = jnp.where(zmask, 0.0, uw)
        vw = jnp.where(zmask, 0.0, vw)
    # Save the pencil for the NEXT band from the already-read window (rows
    # r0+band-sigma..r0+band = window-local [band, band+sigma)).
    pu[...] = uw[band : band + sigma]
    pv[...] = vw[band : band + sigma]

    def asm(band_ref, top_ref, bot_ref):
        return jnp.concatenate([fref(top_ref), fref(band_ref), fref(bot_ref)],
                               axis=0)

    ex = asm(ex_ref, ext_ref, exb_ref)
    ey = asm(ey_ref, eyt_ref, eyb_ref)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)
    local = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 0)
    gr = r0 - sigma + local
    gc = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 1)
    masks = _edge_masks(gr, gc, h, w, (False, False) + aligned_lr)

    def run(ns):
        u = uw
        v = vw
        for _k in range(ns):
            u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
        u_res[pl.ds(r0, band)] = u[sigma : sigma + band]
        v_res[pl.ds(r0, band)] = v[sigma : sigma + band]

    if rem == 0:
        run(s)
    else:
        @pl.when(k < n_full)
        def _():
            run(s)

        @pl.when(k == n_full)
        def _():
            run(rem)

    # Final block: each band DMAs its finished rows to the HBM outputs.
    @pl.when(k == n_blocks - 1)
    def _():
        move([(u_res.at[pl.ds(r0, band)], out_dst(uo_ref, pl.ds(r0, band))),
              (v_res.at[pl.ds(r0, band)], out_dst(vo_ref, pl.ds(r0, band)))])


def _skewed_kernel(ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                   et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                   u0_ref, v0_ref, uo_ref, vo_ref,
                   u_res, v_res, pu, pv, sems, **kw):
    _skewed_body(None, ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                 et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                 u0_ref, v0_ref, uo_ref, vo_ref, u_res, v_res, pu, pv, sems,
                 k=pl.program_id(0), i=pl.program_id(1), **kw)


def _skewed_kernel_b(ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                     et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                     u0_ref, v0_ref, uo_ref, vo_ref,
                     u_res, v_res, pu, pv, sems, **kw):
    """Batched twin: grid=(B, n_blocks, nb) — one full skewed solve per
    frame in a single launch; zero-init only (each frame's k==0 block
    seeds the reused residents)."""
    _skewed_body(pl.program_id(0), ex_ref, ext_ref, exb_ref, ey_ref,
                 eyt_ref, eyb_ref, et_ref, ett_ref, etb_ref, invd_ref,
                 invdt_ref, invdb_ref, u0_ref, v0_ref, uo_ref, vo_ref,
                 u_res, v_res, pu, pv, sems,
                 k=pl.program_id(1), i=pl.program_id(2), **kw)


def _solve_impl(i1, i2, u0, v0, alpha, n_sweeps, variant, geom, interpret):
    from opticalflowhs_tpu.kernels.derivatives import _derivatives_impl

    h, w = i1.shape
    s, rem, sigma, band, hp = geom
    ex, ey, et, invd = _derivatives_impl(
        i1, i2, alpha, variant, interpret, band=band, hp_out=hp, crop=False
    )
    wp = ex.shape[1]
    nb = hp // band
    n_full = (n_sweeps - rem) // s
    n_blocks = n_full + (1 if rem else 0)
    r = band // sigma
    aligned_lr = (True, w == wp)
    zero_init = u0 is None
    if zero_init:
        u0p = jnp.zeros((8, wp), ex.dtype)  # never read
        v0p = u0p
    else:
        u0p = pad_to_tiles(u0.astype(ex.dtype), hp, wp)
        v0p = pad_to_tiles(v0.astype(ex.dtype), hp, wp)

    band_spec = pl.BlockSpec((band, wp), lambda k, i: (i, 0),
                             memory_space=pltpu.VMEM)
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
    out = jax.ShapeDtypeStruct((hp, wp), ex.dtype)
    uo, vo = pl.pallas_call(
        functools.partial(
            _skewed_kernel, s=s, rem=rem, sigma=sigma, band=band, hp=hp,
            h=h, w=w, aligned_lr=aligned_lr, zero_init=zero_init,
            n_full=n_full, n_blocks=n_blocks,
        ),
        grid=(n_blocks, nb),
        out_shape=(out, out),
        in_specs=[band_spec, top_spec, bot_spec] * 4 + [any_spec] * 2,
        out_specs=(any_spec, any_spec),
        scratch_shapes=[
            pltpu.VMEM((hp + sigma, wp), ex.dtype),   # resident u
            pltpu.VMEM((hp + sigma, wp), ex.dtype),   # resident v
            pltpu.VMEM((sigma, wp), ex.dtype),        # pencil u
            pltpu.VMEM((sigma, wp), ex.dtype),        # pencil v
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_LIMIT + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ex, ex, ex, ey, ey, ey, et, et, et, invd, invd, invd, u0p, v0p)
    return uo[:h, :w], vo[:h, :w]


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
    u0p = jnp.zeros((8, wp), ex.dtype)  # never read (zero-init only)

    band_spec = pl.BlockSpec((1, band, wp), lambda b, k, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec(
        (1, sigma, wp),
        lambda b, k, i: (b, jnp.maximum(i * r - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, sigma, wp),
        lambda b, k, i: (b, jnp.minimum((i + 1) * r, nb * r - 1), 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out = jax.ShapeDtypeStruct((bsz, hp, wp), ex.dtype)
    uo, vo = pl.pallas_call(
        functools.partial(
            _skewed_kernel_b, s=s, rem=rem, sigma=sigma, band=band, hp=hp,
            h=h, w=w, aligned_lr=aligned_lr, zero_init=True,
            n_full=n_full, n_blocks=n_blocks,
        ),
        grid=(bsz, n_blocks, nb),
        out_shape=(out, out),
        in_specs=[band_spec, top_spec, bot_spec] * 4 + [any_spec] * 2,
        out_specs=(any_spec, any_spec),
        scratch_shapes=[
            pltpu.VMEM((hp + sigma, wp), ex.dtype),   # resident u
            pltpu.VMEM((hp + sigma, wp), ex.dtype),   # resident v
            pltpu.VMEM((sigma, wp), ex.dtype),        # pencil u
            pltpu.VMEM((sigma, wp), ex.dtype),        # pencil v
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_LIMIT + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ex, ex, ex, ey, ey, ey, et, et, et, invd, invd, invd, u0p, u0p)
    return uo[:, :h, :w], vo[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _solve_batched_ad(i1, i2, alpha, n_sweeps, variant, geom, interpret):
    return _solve_impl_batched(i1, i2, alpha, n_sweeps, variant, geom,
                               interpret)


def _solve_batched_fwd(i1, i2, alpha, n_sweeps, variant, geom, interpret):
    out = _solve_impl_batched(i1, i2, alpha, n_sweeps, variant, geom,
                              interpret)
    return out, (i1, i2)


def _solve_batched_bwd(alpha, n_sweeps, variant, geom, interpret, res, ct):
    from opticalflowhs_tpu.kernels.solve_fused import _jnp_twin_batched

    i1, i2 = res
    _, vjp = jax.vjp(
        lambda a, b: _jnp_twin_batched(a, b, alpha, n_sweeps, variant),
        i1, i2,
    )
    return vjp(ct)


_solve_batched_ad.defvjp(_solve_batched_fwd, _solve_batched_bwd)


def hs_solve_skewed_batched(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    alpha: float,
    n_sweeps: int,
    variant: str = "hs_cube",
    interpret: bool | None = None,
):
    """Batched skewed whole solve for (B, H, W) stacks of beyond-residency
    frames (the B x 4K class): grid=(B, n_blocks, nb), one full u/v-resident
    skewed solve per frame in a single launch. Zero-init only. Returns
    (u, v) or None (smaller frames take the resident/banded batched
    kernels)."""
    if i1.ndim != 3 or i1.shape[0] == 0 or n_sweeps < 2:
        return None
    geom = applicable(i1[0], n_sweeps)
    if geom is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _solve_batched_ad(i1, i2, float(alpha), n_sweeps, variant, geom,
                             interpret)


def applicable(i1, n_sweeps: int):
    """Geometry when the skewed schedule covers this solve, else None:
    2-D frames beyond the 8-array residency class (those take
    kernels/solve_resident.py) whose 2-array u/v residency + window set
    fits — ~2.6-11 Mpx fp32."""
    if i1.ndim != 2 or n_sweeps < 2:
        return None
    from opticalflowhs_tpu.kernels import solve_resident

    h, w = i1.shape
    if h * w < _MIN_PX:
        return None  # fused pipeline wins below ~6 Mpx (see _MIN_PX note)
    if solve_resident.pick_geometry(h, w, i1.dtype) is not None:
        return None  # resident class: the 8-array schedule is stronger
    return pick_geometry(h, w, n_sweeps, i1.dtype, _MAX_S)


def hs_solve_skewed(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    alpha: float,
    n_sweeps: int,
    variant: str = "hs_cube",
    u0: jnp.ndarray | None = None,
    v0: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Whole HS solve with VMEM-resident u/v and streamed fields, in one
    derivative launch + one skewed sweep launch.

    Returns (u, v), or None when the schedule does not apply (resident
    class, batched input, frame too large for 2-array residency); the
    caller falls back to the fused/banded paths. Exact twin of the other
    backends; differentiable via the whole-solve custom_vjp.
    """
    if (u0 is None) != (v0 is None):
        raise ValueError("u0 and v0 must be given together")
    geom = applicable(i1, n_sweeps)
    if geom is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    alpha = float(alpha)
    if u0 is None:
        return _solve_zero_ad(i1, i2, alpha, n_sweeps, variant, geom,
                              interpret)
    return _solve_warm_ad(i1, i2, u0, v0, alpha, n_sweeps, variant, geom,
                          interpret)
