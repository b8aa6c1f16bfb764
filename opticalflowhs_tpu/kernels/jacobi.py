"""Fused Pallas TPU Jacobi-sweep kernels (component N5; reference R2+R3).

The reference enqueues two OpenCL kernels per iteration (neighborhood
average, then update) with a host-side ping-pong swap (SURVEY.md §3.1). On
TPU that is wrong twice over: per-launch overhead n times, and a full HBM
round-trip of u/v per half-step. Here the fixed point runs as:

  * VMEM-resident path (`_sweeps_vmem`): when the padded image fits in VMEM,
    ONE kernel launch runs all n sweeps with u/v living in the output refs
    on-chip — HBM traffic for the whole solve is one read of the inputs and
    one write of the outputs (maximal temporal blocking, SURVEY.md §3.2).
    State lives in mutable refs, not loop carries: Mosaic round-trips SSA
    fori_loop carries through memory every iteration (measured 40% slower),
    so the loop body reads and rewrites the refs.
  * Temporally-blocked banded path (`_sweeps_banded`): for frames beyond
    VMEM, a 1-D grid over row bands; each launch runs `s` sweeps on a band
    extended by s-row halo slabs, so HBM streams the arrays once per s
    sweeps — the TPU analog of FPGA stencil temporal blocking (SURVEY.md
    §2b P4, §7). Halo rows decay one ring per in-kernel sweep while the
    owned band stays exact (same order-independence argument as the
    distributed tiled solver).

Boundary handling: arbitrary H x W is padded to the (8,128)/(16,128) VMEM
tile grid, and the HS clamp boundary is applied *at the true edge* inside
every shift — `where(glob_row == h-1, a, roll(a))` — so pad values are
garbage that true pixels never read. This makes both paths produce the
arithmetic of `ops.stencils.jacobi_step` exactly (same separable [1,2,1]
association order), asserted to ~1-ulp tolerance against the jnp oracle in
tests/unit/test_pallas_kernels.py (SURVEY.md §4 rung 4; the residual ulp is
compile-unit FMA fusion, not formulation).

Shifts use `pltpu.roll`: lane-dim rotates measured ~15% faster than
slice+concat on v5e, and the wrapped column lands in the pad region or is
where-fixed. The separable formulation halves lane-crossing traffic vs the
direct 8-neighbor sum (tools/archive/microbench_sweep*.py record the exploration).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.ops import stencils

_LANE = 128

# VMEM working-set budget for the whole-image path (v5e has 128 MiB VMEM;
# leave headroom for Mosaic temporaries). Overridable for other generations.
_VMEM_BUDGET = int(os.environ.get("HSFLOW_VMEM_BUDGET", str(100 * 1024 * 1024)))
_VMEM_ARRAYS = 17          # operands + temporaries headroom (measured: a
                           # 2-image 720p chunk needs ~15.5 arrays of VMEM)
_UNROLL = int(os.environ.get("HSFLOW_SWEEP_UNROLL", "1"))

_BAND_ROWS = int(os.environ.get("HSFLOW_BAND_ROWS", "0"))  # 0 = auto by width
_FUSED_BANDED = os.environ.get("HSFLOW_FUSED_BANDED", "1") != "0"
_BATCH_STACK_PX = 1_300_000     # max stacked pixels per batched-VMEM chunk
_BATCH_IMG_BYTES = 2_400_000    # frames above ~0.6 Mpx fp32: banded per image
_BAND_ARRAYS = 20                      # assembled fields + temporaries
_AUTO_BLOCK_SWEEPS = 16    # banded-path temporal blocking when cfg says auto


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_band(h: int, wp: int, dtype_bytes: int, sub: int, s_hint: int) -> int:
    """Band height for the banded kernels: as TALL as the VMEM budget
    allows, then shrunk to divide the (sublane-rounded) image height as
    evenly as possible — pad rows are pure wasted compute (measured 11%
    of 1080p at the old fixed sizing; docs/PERFORMANCE.md round 2)."""
    if _BAND_ROWS:
        return _round_up(min(_BAND_ROWS, _round_up(h, sub)), sub)
    halo = _round_up(max(1, s_hint), sub)
    unit = wp * dtype_bytes * _BAND_ARRAYS
    band_max = max(2 * sub, _VMEM_BUDGET // unit - 2 * halo)
    h_units = -(-h // sub)                      # height in sublane units
    bu_max = max(2, band_max // sub)
    nb = -(-h_units // bu_max)                  # fewest bands that fit VMEM
    units = -(-h_units // nb)                   # even split -> minimal pad
    return units * sub


def _sublane(dtype) -> int:
    return 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8


def pad_to_tiles(a: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """Zero-pad the last two axes up to (rows, cols); pad content is never
    read by true pixels (clamp is applied at the true edge in-kernel)."""
    h, w = a.shape[-2:]
    if h == rows and w == cols:
        return a
    widths = [(0, 0)] * (a.ndim - 2) + [(0, rows - h), (0, cols - w)]
    return jnp.pad(a, widths)


# -- kernel-side sweep math ----------------------------------------------------


def _edge_masks(gr, gc, h, w, aligned=(False, False, False, False)):
    """Boolean clamp masks from global row/col index grids; computed once per
    kernel (hoisted out of the sweep loop). `aligned` marks sides whose true
    edge coincides with the working array's edge — those get None and the
    kernel uses a clamped concat shift instead of roll+where."""
    return (
        None if aligned[0] else gr == 0,
        None if aligned[1] else gr == h - 1,
        None if aligned[2] else gc == 0,
        None if aligned[3] else gc == w - 1,
    )


def _cshift(a, shift: int, axis: int):
    """Clamped slice+concat shift: shift==1 -> out[i]=a[i-1] (clamp at 0),
    shift==n-1 -> out[i]=a[i+1] (clamp at n-1)."""
    n = a.shape[axis]
    lo = [slice(None)] * a.ndim
    hi = [slice(None)] * a.ndim
    if shift == 1:
        lo[axis] = slice(0, 1)
        hi[axis] = slice(0, n - 1)
    else:
        assert shift == n - 1, shift
        lo[axis] = slice(1, None)
        hi[axis] = slice(n - 1, n)
    return jnp.concatenate([a[tuple(lo)], a[tuple(hi)]], axis=axis)


def _shift(a, shift: int, axis: int):
    """Rotate: pltpu.roll where Mosaic supports it; bf16 roll fails to lower
    (measured, tools/archive/hw_bf16_diag.py) so bf16 uses the clamped concat shift
    — the boundary rows/cols differ from a true roll only where the edge
    masks override them or in discardable halo/pad regions."""
    if a.dtype == jnp.bfloat16:
        return _cshift(a, shift, axis)
    return pltpu.roll(a, shift=shift, axis=axis)


def _navg(a, masks):
    """Kernel-side 8-neighbor average on a (th, tw) working tile.

    masks = (top, bottom, left, right): boolean grids marking the true image
    edges where the HS clamp replaces the rolled neighbor — or None when
    that true edge coincides with the array edge, in which case a clamped
    concat shift implements the boundary in ONE op instead of roll+where
    (the kernels are per-op-dispatch-bound; docs/PERFORMANCE.md). Same
    association order as ops.stencils.neighbor_avg — shared by the Jacobi
    and SOR kernels so the oracle-equivalence chain covers both.
    """
    th, tw = a.shape
    m_top, m_bot, m_lf, m_rt = masks

    def sh(x, m, shift, axis):
        if m is None:
            return _cshift(x, shift, axis)
        return jnp.where(m, x, _shift(x, shift, axis))

    up = sh(a, m_top, 1, 0)            # a(i-1)
    dn = sh(a, m_bot, th - 1, 0)       # a(i+1)
    t = up + 2.0 * a + dn
    rt = sh(t, m_lf, 1, 1)             # t(j-1)
    lf = sh(t, m_rt, tw - 1, 1)        # t(j+1)
    s = rt + 2.0 * t + lf
    return s * (1.0 / 12.0) - a * (1.0 / 3.0)


def _kernel_step(u, v, ex, ey, et, invd, masks):
    """One Jacobi sweep on a (th, tw) working tile (see _navg for the mask
    contract). Same association order as ops.stencils.jacobi_step."""
    ubar = _navg(u, masks)
    vbar = _navg(v, masks)
    frac = (ex * ubar + ey * vbar + et) * invd
    return ubar - ex * frac, vbar - ey * frac


# -- whole-image VMEM-resident path -------------------------------------------


def _vmem_kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref,
                 vo_ref, *, n_sweeps: int, h: int, w: int, img_rows: int = 0):
    ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
    hp, wp = ex.shape
    gr = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    if img_rows:  # batched stack of images along rows: clamp per image
        gr = gr % img_rows
    gc = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    aligned = (
        not img_rows,                      # array row 0 is the true top
        not img_rows and h == hp,          # no bottom pad
        True,                              # array col 0 is the true left
        w == wp,                           # no right pad
    )
    masks = _edge_masks(gr, gc, h, w, aligned)
    uo_ref[...] = u0_ref[...]
    vo_ref[...] = v0_ref[...]

    unroll = min(_UNROLL, n_sweeps)

    def run_block(k):
        def body(_, x):
            u, v = uo_ref[...], vo_ref[...]
            for _i in range(k):
                u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
            uo_ref[...] = u
            vo_ref[...] = v
            return x
        return body

    n_blocks, rem = divmod(n_sweeps, unroll)
    jax.lax.fori_loop(0, n_blocks, run_block(unroll), 0)
    if rem:
        run_block(rem)(0, 0)


def _sweeps_vmem(u, v, ex, ey, et, invd, n_sweeps, h, w, interpret,
                 img_rows: int = 0):
    out = jax.ShapeDtypeStruct(u.shape, u.dtype)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _vmem_kernel, n_sweeps=n_sweeps, h=h, w=w, img_rows=img_rows
        ),
        out_shape=(out, out),
        in_specs=[spec] * 6,
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024
        ),
        interpret=interpret,
    )(ex, ey, et, invd, u, v)


# -- temporally-blocked banded path -------------------------------------------


def _banded_kernel(r0_ref, c0_ref, u_ref, ut_ref, ub_ref, v_ref, vt_ref, vb_ref,
                   ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                   et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                   uo_ref, vo_ref, *, s: int, halo: int, band: int, h: int,
                   w: int, aligned_lr: tuple, fold: tuple | None = None):
    i = pl.program_id(0)

    def asm(band_ref, top_ref, bot_ref):
        return jnp.concatenate([top_ref[0], band_ref[...], bot_ref[0]], axis=0)

    u = asm(u_ref, ut_ref, ub_ref)
    v = asm(v_ref, vt_ref, vb_ref)
    ex = asm(ex_ref, ext_ref, exb_ref)
    ey = asm(ey_ref, eyt_ref, eyb_ref)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)

    th, wp = u.shape  # (band + 2*halo, Wp); halo >= s (sublane-rounded)
    local = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0)
    # (r0, c0): global coordinates of array element (0, 0) — zero for whole
    # images, the halo-padded tile origin for the distributed big-tile path.
    gr = r0_ref[0] + i * band - halo + local
    gc = c0_ref[0] + jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1)
    if fold is not None:
        # Folded layout (docstring of _sweeps_banded_folded): lane position
        # gc sits in segment seg covering image rows [seg*hs, (seg+1)*hs);
        # array row r maps to image row seg*hs + (r - sf). Same mod-by-
        # constant trick as the batched stacked kernel's per-image clamp.
        hs_f, sf_f, wseg = fold
        seg = gc // wseg
        gc = gc - seg * wseg
        gr = seg * hs_f + gr - sf_f
    # rows cross band halos -> masks; column alignment is the caller's call
    # (whole images: col 0 is the true left edge, right edge coincides when
    # no lane padding was needed; tiles: both columns need masks).
    masks = _edge_masks(gr, gc, h, w, (False, False) + aligned_lr)
    for _k in range(s):
        u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
    uo_ref[...] = u[halo : halo + band]
    vo_ref[...] = v[halo : halo + band]


def _banded_block(u, v, ex, ey, et, invd, inv_slabs, s, halo, band, h, w,
                  interpret, row0, col0, aligned_lr, fold=None):
    """One s-sweep launch over row bands with `halo`-row halo slabs.

    halo = round_up(s, sublane) so slab blocks satisfy the (8,128)/(16,128)
    Mosaic block-shape constraint; the extra halo rows are redundant compute.
    """
    hp, wp = u.shape
    nb = hp // band

    def slabs(x):
        b = x.reshape(nb, band, wp)
        # top[i] = band i-1's last `halo` rows (i=0: arbitrary — never read
        # by true pixels, clamp fires at glob_row==0); bottom[i] likewise.
        top = jnp.concatenate([b[:1, band - halo :], b[:-1, band - halo :]], axis=0)
        bot = jnp.concatenate([b[1:, :halo], b[-1:, :halo]], axis=0)
        return top, bot

    ut, ub = slabs(u)
    vt, vb = slabs(v)
    (ext, exb), (eyt, eyb), (ett, etb), (invdt, invdb) = inv_slabs

    band_spec = pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, halo, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = jax.ShapeDtypeStruct((hp, wp), u.dtype)
    return pl.pallas_call(
        functools.partial(_banded_kernel, s=s, halo=halo, band=band, h=h, w=w,
                          aligned_lr=aligned_lr, fold=fold),
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


def _sweeps_banded(u, v, ex, ey, et, invd, n_sweeps, s, band, h, w, interpret,
                   row0=0, col0=0, aligned_lr=None):
    hp, wp = u.shape
    nb = hp // band
    halo = _round_up(s, _sublane(u.dtype))
    if aligned_lr is None:
        aligned_lr = (True, w == wp)

    def inv_slab(x):
        b = x.reshape(nb, band, wp)
        return (
            jnp.concatenate([b[:1, band - halo :], b[:-1, band - halo :]], axis=0),
            jnp.concatenate([b[1:, :halo], b[-1:, :halo]], axis=0),
        )

    # Loop-invariant: computed once, hoisted out of the launch loop by XLA.
    inv_slabs = tuple(inv_slab(a) for a in (ex, ey, et, invd))

    def block(uv, k):
        return _banded_block(
            uv[0], uv[1], ex, ey, et, invd, inv_slabs, k, halo, band, h, w,
            interpret, row0, col0, aligned_lr,
        )

    n_blocks, rem = divmod(n_sweeps, s)
    uv = (u, v)
    if n_blocks:
        uv = jax.lax.fori_loop(0, n_blocks, lambda _, x: block(x, s), uv)
    if rem:
        uv = block(uv, rem)
    return uv


# -- fused banded megakernel: ALL sweep blocks in ONE launch -------------------
#
# The multi-launch banded path pays a fixed per-launch cost (XLA slab
# assembly for u/v, dispatch, grid pipeline fill/drain) measured at
# ~250 us — 31% of a single-frame 1080p block (derived from the B1-vs-B4
# batched-banded numbers, docs/PERFORMANCE.md). This variant runs the
# whole (n_blocks, n_bands) schedule inside one pallas_call: the
# loop-invariant fields ride the normal banded BlockSpecs (Mosaic
# pipelines their fetches across grid steps), while u/v ping-pong between
# two HBM buffers by block parity with in-kernel DMA — block k reads the
# buffer block k-1 wrote, which the lexicographic grid order has already
# completed. Same per-sweep math and masks as _banded_kernel, so the
# oracle-equivalence chain extends through it unchanged.


def _fused_banded_kernel(ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                         et_ref, ett_ref, etb_ref, invd_ref, invdt_ref,
                         invdb_ref, u0_ref, v0_ref,
                         ua_ref, ub_ref, va_ref, vb_ref,
                         uw_ref, vw_ref, sems, *,
                         s: int, sigma: int, band: int, h: int, w: int,
                         aligned_lr: tuple):
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
        # Sources carry a sigma-row pad top+bottom, so every window is
        # in-bounds; pad/garbage rows sit beyond the true image edge and
        # the clamp masks keep them out of true pixels.
        move([(su_ref.at[pl.ds(i * band, win)], uw_ref),
              (sv_ref.at[pl.ds(i * band, win)], vw_ref)])

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
        return jnp.concatenate([top_ref[0], band_ref[...], bot_ref[0]], axis=0)

    ex = asm(ex_ref, ext_ref, exb_ref)
    ey = asm(ey_ref, eyt_ref, eyb_ref)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)
    u = uw_ref[...]
    v = vw_ref[...]
    local = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 0)
    gr = i * band - sigma + local
    gc = jax.lax.broadcasted_iota(jnp.int32, (win, ex.shape[1]), 1)
    masks = _edge_masks(gr, gc, h, w, (False, False) + aligned_lr)
    for _k in range(s):
        u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
    uw_ref[...] = u
    vw_ref[...] = v

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


def _sweeps_banded_fused(u, v, ex, ey, et, invd, n_sweeps, s, band, h, w,
                         interpret):
    """All n_sweeps on (hp, wp)-padded arrays in one pallas_call.

    Falls back to the multi-launch path when there are fewer than two
    s-sweep blocks (nothing to fuse). The s-remainder runs as one trailing
    _sweeps_banded launch.
    """
    hp, wp = u.shape
    nb = hp // band
    sigma = _round_up(s, _sublane(u.dtype))
    n_blocks, rem = divmod(n_sweeps, s)
    if n_blocks < 2:
        return _sweeps_banded(u, v, ex, ey, et, invd, n_sweeps, s, band, h, w,
                              interpret)
    aligned_lr = (True, w == wp)

    def inv_slab(x):
        b = x.reshape(nb, band, wp)
        return (
            jnp.concatenate([b[:1, band - sigma :], b[:-1, band - sigma :]], axis=0),
            jnp.concatenate([b[1:, :sigma], b[-1:, :sigma]], axis=0),
        )

    (ext, exb), (eyt, eyb), (ett, etb), (invdt, invdb) = (
        inv_slab(a) for a in (ex, ey, et, invd)
    )
    upad = jnp.pad(u, ((sigma, sigma), (0, 0)))
    vpad = jnp.pad(v, ((sigma, sigma), (0, 0)))

    band_spec = pl.BlockSpec((band, wp), lambda k, i: (i, 0),
                             memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, sigma, wp), lambda k, i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    buf = jax.ShapeDtypeStruct((hp + 2 * sigma, wp), u.dtype)
    ua, ub, va, vb = pl.pallas_call(
        functools.partial(_fused_banded_kernel, s=s, sigma=sigma, band=band,
                          h=h, w=w, aligned_lr=aligned_lr),
        grid=(n_blocks, nb),
        out_shape=(buf, buf, buf, buf),
        in_specs=[band_spec, slab_spec, slab_spec] * 4 + [any_spec] * 2,
        out_specs=(any_spec,) * 4,
        scratch_shapes=[
            pltpu.VMEM((band + 2 * sigma, wp), u.dtype),
            pltpu.VMEM((band + 2 * sigma, wp), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ex, ext, exb, ey, eyt, eyb, et, ett, etb, invd, invdt, invdb,
      upad, vpad)
    uf, vf = (ub, vb) if n_blocks % 2 == 1 else (ua, va)
    uo, vo = uf[sigma : sigma + hp], vf[sigma : sigma + hp]
    if rem:
        uo, vo = _sweeps_banded(uo, vo, ex, ey, et, invd, rem, rem, band, h,
                                w, interpret)
    return uo, vo


# -- folded banded path: lane-pack row segments of one frame -------------------
#
# For beyond-VMEM frames that are "too narrow" (1080p: 1920 lanes), fold
# the frame into k side-by-side segments: segment g holds image rows
# [g*hs, (g+1)*hs) at lane block [g*wp, (g+1)*wp), carrying sf >= s
# fold-halo rows above and below (copies of the neighbor segments' edge
# rows). Within a sweep block the fold halos decay exactly like band
# halos; between blocks a lane-roll refresh recopies them from the owning
# segment. Lane seams coincide with the true left/right image edges, where
# the clamp masks already replace the rolled-in neighbor — so the folded
# sweep is the SAME arithmetic per owned pixel as the unfolded one
# (oracle-equivalence chain unchanged; hardware-exact, 0.0 at 1080p).
#
# DEFAULT OFF. The raw-call window-shape probe (tools/hw_shape_probe.py)
# suggested a 1.53x win for 304x3840-class windows, but the solve-context
# control (tools/hw_shape_control.py) measured the real shape advantage at
# only ~8% (544x3840 5.66 ms vs 1088x1920 6.14 ms, same process), which
# the fold-halo redundancy + refresh costs back: folded 1080p measured
# 6.44 ms vs 5.77 plain at i100 (tools/hw_folded_ab.py). Kept env-gated
# (HSFLOW_FOLD_LANES=<target lanes>) because the i20 video preset measured
# 17% FASTER folded (4.35 vs 5.08 ms) — a lead for low-iteration tuning.


_FOLD_LANES = int(os.environ.get("HSFLOW_FOLD_LANES", "0"))


def _pick_fold(h: int, wp: int, sub: int, s_hint: int) -> int:
    """Fold factor: widen toward _FOLD_LANES lanes while keeping the fold-halo
    overhead (2*sf/hs) small. 1 = no fold."""
    if _FOLD_LANES <= 0:
        return 1
    k = max(1, _FOLD_LANES // wp)
    sf = _round_up(max(1, s_hint), sub)
    while k > 1:
        hs = _round_up(-(-h // k), sub)
        if hs >= max(8 * sf, 128):
            break
        k -= 1
    return k


def _fold(x, k: int, hs: int, sf: int):
    """(k*hs, wp)-padded image -> (hs + 2*sf, k*wp) folded layout with fold
    halos. Wrapped segments (top of seg 0, bottom of seg k-1) land beyond the
    true image edges where the clamp masks make their content unread."""
    wp = x.shape[1]
    b = pad_to_tiles(x, k * hs, wp).reshape(k, hs, wp)
    top = jnp.concatenate([b[-1:, hs - sf:], b[:-1, hs - sf:]], axis=0)
    bot = jnp.concatenate([b[1:, :sf], b[:1, :sf]], axis=0)
    f = jnp.concatenate([top, b, bot], axis=1)          # (k, hf, wp)
    return jnp.swapaxes(f, 0, 1).reshape(hs + 2 * sf, k * wp)


def _unfold(x, k: int, hs: int, sf: int):
    wp = x.shape[1] // k
    y = x[sf:sf + hs].reshape(hs, k, wp)
    return jnp.swapaxes(y, 0, 1).reshape(k * hs, wp)


def _sweeps_banded_folded(u, v, ex, ey, et, invd, n_sweeps, s, h, w, k,
                          interpret):
    """Banded sweeps in k-fold lane-packed layout; returns (k*hs, wp) arrays
    the caller crops to (h, w). Inputs are lane-padded but NOT row-padded."""
    sub = _sublane(u.dtype)
    wp = u.shape[1]
    dtype_bytes = jnp.dtype(u.dtype).itemsize
    hs = _round_up(-(-h // k), sub)
    sf = _round_up(s, sub)
    hf = hs + 2 * sf
    wf = k * wp
    band = _pick_band(hf, wf, dtype_bytes, sub, s)
    hfp = _round_up(hf, band)
    s = max(1, min(s, band // 2))
    fold_geom = (hs, sf, wp)

    uf, vf, exf, eyf, etf, invdf = (
        pad_to_tiles(_fold(a, k, hs, sf), hfp, wf)
        for a in (u, v, ex, ey, et, invd)
    )

    halo = _round_up(s, sub)
    nb = hfp // band

    def inv_slab(x):
        b = x.reshape(nb, band, wf)
        return (
            jnp.concatenate([b[:1, band - halo:], b[:-1, band - halo:]], axis=0),
            jnp.concatenate([b[1:, :halo], b[-1:, :halo]], axis=0),
        )

    inv_slabs = tuple(inv_slab(a) for a in (exf, eyf, etf, invdf))

    def refresh(x):
        # Re-copy fold halos from the owning segments: the top halo of seg g
        # is seg g-1's last sf owned rows (lane-roll right by one segment);
        # the bottom halo is seg g+1's first sf owned rows (roll left). The
        # wrapped segments land beyond the true image edge (unread).
        top = jnp.roll(x[hs:hs + sf], wp, axis=1)
        bot = jnp.roll(x[sf:2 * sf], -wp, axis=1)
        return x.at[0:sf].set(top).at[sf + hs:hf].set(bot)

    def block(uv, kk):
        return _banded_block(
            refresh(uv[0]), refresh(uv[1]), exf, eyf, etf, invdf, inv_slabs,
            kk, halo, band, h, w, interpret, 0, 0, (False, False),
            fold=fold_geom,
        )

    n_blocks, rem = divmod(n_sweeps, s)
    uv = (uf, vf)
    if n_blocks:
        uv = jax.lax.fori_loop(0, n_blocks, lambda _, x: block(x, s), uv)
    if rem:
        uv = block(uv, rem)
    return _unfold(uv[0], k, hs, sf), _unfold(uv[1], k, hs, sf)


# -- batched banded path (HD+ video frames) -----------------------------------


def _banded_kernel_b(u_ref, ut_ref, ub_ref, v_ref, vt_ref, vb_ref,
                     ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                     et_ref, ett_ref, etb_ref, invd_ref, invdt_ref, invdb_ref,
                     uo_ref, vo_ref, *, s: int, halo: int, band: int,
                     h: int, w: int):
    """Batched twin of _banded_kernel: grid (B, nb), every op covers one
    band of one image; the batch grid dimension replaces the per-image
    Python launch loop (and its optimization_barrier serialization)."""
    i = pl.program_id(1)

    def asm(band_ref, top_ref, bot_ref):
        return jnp.concatenate([top_ref[0, 0], band_ref[0], bot_ref[0, 0]], axis=0)

    u = asm(u_ref, ut_ref, ub_ref)
    v = asm(v_ref, vt_ref, vb_ref)
    ex = asm(ex_ref, ext_ref, exb_ref)
    ey = asm(ey_ref, eyt_ref, eyb_ref)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)

    th, wp = u.shape
    local = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0)
    gr = i * band - halo + local
    gc = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1)
    masks = _edge_masks(gr, gc, h, w, (False, False, True, w == wp))
    for _k in range(s):
        u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
    uo_ref[0] = u[halo : halo + band]
    vo_ref[0] = v[halo : halo + band]


def _banded_block_b(u, v, ex, ey, et, invd, inv_slabs, s, halo, band, h, w,
                    interpret):
    """One s-sweep launch over a (B, nb) grid of row bands."""
    b, hp, wp = u.shape
    nb = hp // band

    def slabs(x):
        r = x.reshape(b, nb, band, wp)
        top = jnp.concatenate(
            [r[:, :1, band - halo :], r[:, :-1, band - halo :]], axis=1
        )
        bot = jnp.concatenate([r[:, 1:, :halo], r[:, -1:, :halo]], axis=1)
        return top, bot

    ut, ub = slabs(u)
    vt, vb = slabs(v)
    (ext, exb), (eyt, eyb), (ett, etb), (invdt, invdb) = inv_slabs

    band_spec = pl.BlockSpec(
        (1, band, wp), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM
    )
    slab_spec = pl.BlockSpec(
        (1, 1, halo, wp), lambda k, i: (k, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = jax.ShapeDtypeStruct((b, hp, wp), u.dtype)
    return pl.pallas_call(
        functools.partial(_banded_kernel_b, s=s, halo=halo, band=band, h=h, w=w),
        grid=(b, nb),
        out_shape=(out, out),
        in_specs=[band_spec, slab_spec, slab_spec] * 6,
        out_specs=(band_spec, band_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u, ut, ub, v, vt, vb, ex, ext, exb, ey, eyt, eyb,
      et, ett, etb, invd, invdt, invdb)


def _sweeps_banded_batched(u, v, ex, ey, et, invd, n_sweeps, s, band, h, w,
                           interpret):
    b, hp, wp = u.shape
    nb = hp // band
    halo = _round_up(s, _sublane(u.dtype))

    def inv_slab(x):
        r = x.reshape(b, nb, band, wp)
        return (
            jnp.concatenate(
                [r[:, :1, band - halo :], r[:, :-1, band - halo :]], axis=1
            ),
            jnp.concatenate([r[:, 1:, :halo], r[:, -1:, :halo]], axis=1),
        )

    inv_slabs = tuple(inv_slab(a) for a in (ex, ey, et, invd))

    def block(uv, k):
        return _banded_block_b(
            uv[0], uv[1], ex, ey, et, invd, inv_slabs, k, halo, band, h, w,
            interpret,
        )

    n_blocks, rem = divmod(n_sweeps, s)
    uv = (u, v)
    if n_blocks:
        uv = jax.lax.fori_loop(0, n_blocks, lambda _, x: block(x, s), uv)
    if rem:
        uv = block(uv, rem)
    return uv


# -- batched whole-image path (video / DP workloads) --------------------------


def jacobi_sweeps_batched(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n_sweeps: int,
    block_sweeps: int = 0,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused sweeps for a (B, H, W) stack of independent frame pairs.

    Small frames are per-op-dispatch-bound in Mosaic (~1us fixed cost per
    full-array vector op — measured, see tools/archive/microbench_sweep*.py), so the
    batch is stacked into one (B*Hp, Wp) array: every vector op then covers
    B images, amortizing the fixed cost. Clamp masks use row % Hp so each
    image keeps its own boundary; rolls crossing image seams land in masked
    or pad rows. VMEM chunking splits B when the stack outgrows the budget.

    Frames beyond the stacked-VMEM budget (HD and up) take the banded
    temporally-blocked kernel with a (B, n_bands) grid — one launch per
    s-sweep block for the WHOLE batch, same per-band working set as the
    single-image banded path.

    Differentiable via the same custom_vjp scheme as jacobi_sweeps (kernel
    forward, vmapped jnp-twin VJP backward).
    """
    if u.ndim != 3:
        raise ValueError(f"jacobi_sweeps_batched expects (B, H, W), got {u.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_sweeps == 0 or u.shape[0] == 0:
        return u, v
    return _jacobi_sweeps_batched_ad(
        u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _jacobi_sweeps_batched_ad(u, v, ex, ey, et, inv_den, n_sweeps,
                              block_sweeps, interpret):
    return _jacobi_sweeps_batched_impl(
        u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps, interpret
    )


def _jacobi_sweeps_batched_ad_fwd(u, v, ex, ey, et, inv_den, n_sweeps,
                                  block_sweeps, interpret):
    out = _jacobi_sweeps_batched_impl(
        u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps, interpret
    )
    return out, (u, v, ex, ey, et, inv_den)


def _jacobi_sweeps_batched_ad_bwd(n_sweeps, block_sweeps, interpret, res, ct):
    u, v, ex, ey, et, inv_den = res
    _, vjp = jax.vjp(
        jax.vmap(lambda *a: _jnp_sweeps(*a, n_sweeps)),
        u, v, ex, ey, et, inv_den,
    )
    return vjp(ct)


_jacobi_sweeps_batched_ad.defvjp(
    _jacobi_sweeps_batched_ad_fwd, _jacobi_sweeps_batched_ad_bwd
)


def _jacobi_sweeps_batched_impl(u, v, ex, ey, et, inv_den, n_sweeps,
                                block_sweeps, interpret):
    b, h, w = u.shape
    sub = _sublane(u.dtype)
    hp = _round_up(h, sub)
    wp = _round_up(w, _LANE)
    dtype_bytes = jnp.dtype(u.dtype).itemsize
    per_image = hp * wp * dtype_bytes * _VMEM_ARRAYS
    # XLA charges the kernel's scoped-VMEM against whatever the SURROUNDING
    # program already keeps in VMEM, so inside a large batched jit the
    # effective limit is smaller than standalone (measured: a lone 720p
    # stack OOMs inside an 8x720p program). Stay conservative: stacked-VMEM
    # only for small frames, and cap the stack height; larger frames take
    # the batched banded path (same band working set as single-image).
    chunk = max(1, min(_VMEM_BUDGET // max(per_image, 1),
                       _BATCH_STACK_PX // max(hp * wp, 1)))
    if hp * wp * dtype_bytes > _BATCH_IMG_BYTES:
        s_hint = block_sweeps if block_sweeps > 0 else _AUTO_BLOCK_SWEEPS
        band = _pick_band(h, wp, dtype_bytes, sub, min(s_hint, n_sweeps))
        hpb = _round_up(h, band)
        args = [
            pad_to_tiles(a, hpb, wp) for a in (u, v, ex, ey, et, inv_den)
        ]
        s = block_sweeps if block_sweeps > 0 else _AUTO_BLOCK_SWEEPS
        s = max(1, min(s, n_sweeps, band // 2))
        uo, vo = _sweeps_banded_batched(
            *args, n_sweeps, s, band, h, w, interpret
        )
        return uo[:, :h, :w], vo[:, :h, :w]

    args = [
        pad_to_tiles(a, hp, wp).reshape(-1, wp)  # (B*Hp, Wp)
        for a in (u, v, ex, ey, et, inv_den)
    ]
    us, vs = [], []
    for k0 in range(0, b, chunk):
        k1 = min(k0 + chunk, b)
        sl = slice(k0 * hp, k1 * hp)
        uo, vo = _sweeps_vmem(
            *(a[sl] for a in args), n_sweeps, h, w, interpret, img_rows=hp
        )
        us.append(uo.reshape(-1, hp, wp)[:, :h, :w])
        vs.append(vo.reshape(-1, hp, wp)[:, :h, :w])
    return jnp.concatenate(us), jnp.concatenate(vs)


# -- per-shard tile kernel for the distributed tiled solver -------------------


def _tile_kernel(r0_ref, c0_ref, ex_ref, ey_ref, et_ref, invd_ref, u0_ref,
                 v0_ref, uo_ref, vo_ref, *, n_sweeps: int, h: int, w: int):
    ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
    hp, wp = ex.shape
    gr = r0_ref[0] + jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    gc = c0_ref[0] + jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    masks = _edge_masks(gr, gc, h, w)
    u, v = u0_ref[...], v0_ref[...]
    for _k in range(n_sweeps):
        u, v = _kernel_step(u, v, ex, ey, et, invd, masks)
    uo_ref[...] = u
    vo_ref[...] = v


def tile_sweeps(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n_sweeps: int,
    row0,
    col0,
    h: int,
    w: int,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """n sweeps on one chip's halo-padded tile (distributed hot loop).

    (row0, col0) — traced global coordinates of the tile's top-left element
    (halo included, may be negative) — enter the kernel as SMEM scalars so
    the HS clamp fires only at the *true global* image edges; tile-edge halo
    rings decay one per sweep exactly as in the jnp shard body (the caller
    guarantees halo width >= n_sweeps). Tiles are zero-padded to the VMEM
    tile grid; pad values are never read by true pixels.

    Tiles beyond the whole-tile VMEM budget (a 4K-class frame share per
    chip) take the banded temporally-blocked kernel with the same global-
    origin masks — per-band working set instead of whole-tile residency.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_sweeps == 0:
        return u, v
    th, tw = u.shape
    sub = _sublane(u.dtype)
    wp = _round_up(tw, _LANE)
    dtype_bytes = jnp.dtype(u.dtype).itemsize
    hp = _round_up(th, sub)
    if hp * wp * dtype_bytes * _VMEM_ARRAYS > _VMEM_BUDGET:
        band = _pick_band(th, wp, dtype_bytes, sub,
                          min(_AUTO_BLOCK_SWEEPS, n_sweeps))
        hp = _round_up(th, band)
        args = [pad_to_tiles(a, hp, wp) for a in (u, v, ex, ey, et, inv_den)]
        s = max(1, min(_AUTO_BLOCK_SWEEPS, n_sweeps, band // 2))
        uo, vo = _sweeps_banded(
            *args, n_sweeps, s, band, h, w, interpret,
            row0=row0, col0=col0, aligned_lr=(False, False),
        )
        return uo[:th, :tw], vo[:th, :tw]
    args = [pad_to_tiles(a, hp, wp) for a in (ex, ey, et, inv_den, u, v)]
    out = jax.ShapeDtypeStruct((hp, wp), u.dtype)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    uo, vo = pl.pallas_call(
        functools.partial(_tile_kernel, n_sweeps=n_sweeps, h=h, w=w),
        out_shape=(out, out),
        in_specs=[sspec, sspec] + [vspec] * 6,
        out_specs=(vspec, vspec),
        interpret=interpret,
    )(
        jnp.asarray(row0, jnp.int32).reshape(1),
        jnp.asarray(col0, jnp.int32).reshape(1),
        *args,
    )
    return uo[:th, :tw], vo[:th, :tw]


# -- public entry --------------------------------------------------------------


def _jnp_sweeps(u, v, ex, ey, et, invd, n_sweeps):
    """The jnp oracle twin of the kernels (same arithmetic to ~1 ulp),
    reverse-differentiable — the backward passes below ride its VJP. The
    loop is sqrt(n)-checkpointed (stencils.checkpointed_loop) so gradient
    memory is O(sqrt(n)) field-sized residuals instead of O(n); forward
    arithmetic is identical."""
    return stencils.checkpointed_loop(
        lambda uv: stencils.jacobi_step(uv[0], uv[1], ex, ey, et, invd),
        (u, v), n_sweeps,
    )


def jacobi_sweeps(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n_sweeps: int,
    block_sweeps: int = 0,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run n fused Jacobi sweeps on TPU; exact twin of the jnp sweep loop.

    Strategy by padded-image VMEM footprint: whole-image VMEM residency when
    it fits (one launch, all sweeps on-chip), else temporally-blocked row
    bands streaming HBM once per `block_sweeps` sweeps (0 = auto -> 8).

    Differentiable: a custom_vjp runs the Mosaic kernel forward and the VJP
    of the jnp twin backward (each sweep is affine in (u, v) with a fixed
    linear operator, but gradients w.r.t. the ex/ey/et/inv_den fields need
    the per-sweep intermediates, so the backward recomputes the forward as
    a scan). Since kernel == jnp to ~1 ulp, gradients equal the jnp
    backend's exactly.
    """
    if u.ndim != 2:
        raise ValueError(f"jacobi_sweeps expects 2-D fields, got {u.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_sweeps == 0:
        return u, v
    return _jacobi_sweeps_ad(
        u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _jacobi_sweeps_ad(u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps,
                      interpret):
    return _jacobi_sweeps_impl(
        u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps, interpret
    )


def _jacobi_sweeps_ad_fwd(u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps,
                          interpret):
    out = _jacobi_sweeps_impl(
        u, v, ex, ey, et, inv_den, n_sweeps, block_sweeps, interpret
    )
    return out, (u, v, ex, ey, et, inv_den)


def _jacobi_sweeps_ad_bwd(n_sweeps, block_sweeps, interpret, res, ct):
    u, v, ex, ey, et, inv_den = res
    _, vjp = jax.vjp(
        lambda *a: _jnp_sweeps(*a, n_sweeps), u, v, ex, ey, et, inv_den
    )
    return vjp(ct)


_jacobi_sweeps_ad.defvjp(_jacobi_sweeps_ad_fwd, _jacobi_sweeps_ad_bwd)


def _jacobi_sweeps_impl(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n_sweeps: int,
    block_sweeps: int = 0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    h, w = u.shape
    sub = _sublane(u.dtype)
    wp = _round_up(w, _LANE)
    dtype_bytes = jnp.dtype(u.dtype).itemsize
    hp_vmem = _round_up(h, sub)
    fits_vmem = hp_vmem * wp * dtype_bytes * _VMEM_ARRAYS <= _VMEM_BUDGET
    s_hint = block_sweeps if block_sweeps > 0 else _AUTO_BLOCK_SWEEPS
    k_fold = 1 if fits_vmem else _pick_fold(h, wp, sub, min(s_hint, n_sweeps))

    if k_fold > 1:
        # opt-in (HSFLOW_FOLD_LANES): lane-pack k row segments of a narrow
        # beyond-VMEM frame; runs the multi-launch schedule.
        args = [pad_to_tiles(a, h, wp) for a in (u, v, ex, ey, et, inv_den)]
        s = max(1, min(s_hint, n_sweeps))
        uo, vo = _sweeps_banded_folded(
            *args, n_sweeps, s, h, w, k_fold, interpret
        )
        return uo[:h, :w], vo[:h, :w]

    if fits_vmem:
        hp = hp_vmem
    else:
        band = _pick_band(h, wp, dtype_bytes, sub, min(s_hint, n_sweeps))
        hp = _round_up(h, band)

    args = [pad_to_tiles(a, hp, wp) for a in (u, v, ex, ey, et, inv_den)]
    if fits_vmem:
        uo, vo = _sweeps_vmem(*args, n_sweeps, h, w, interpret)
    else:
        s = block_sweeps if block_sweeps > 0 else _AUTO_BLOCK_SWEEPS
        s = min(s, n_sweeps, band // 2)
        s = max(s, 1)
        banded = _sweeps_banded_fused if _FUSED_BANDED else _sweeps_banded
        uo, vo = banded(*args, n_sweeps, s, band, h, w, interpret)
    return uo[:h, :w], vo[:h, :w]
