"""Fused Pallas TPU Jacobi-sweep kernels (component N5; reference R2+R3).

The reference enqueues two OpenCL kernels per iteration (neighborhood average,
then update) with a host-side ping-pong buffer swap (SURVEY.md §3.1). On TPU
that structure is wrong twice over: per-launch overhead n times, and a full
HBM round-trip of u/v per half-step. Here the whole n-sweep fixed point runs
as Pallas kernels:

  * VMEM-resident path (`_sweeps_vmem`): when the padded image fits in VMEM,
    ONE kernel launch runs all n sweeps with u/v living entirely on-chip —
    HBM traffic for the whole solve is one read of the 6 inputs and one write
    of the 2 outputs. This is maximal temporal blocking (SURVEY.md §3.2): the
    arithmetic-bound regime at >100 sweeps of small/medium frames.
  * Row-banded path (`_sweep_banded`): for frames too large for VMEM, a 1-D
    grid over row bands; each band reads its neighbors' edge rows as halo
    (three-view BlockSpec trick — overlapping reads are expressed as the
    previous/current/next band of the same array). One sweep per launch,
    n launches chained in a `lax.fori_loop`, still fully on-device.

Exactness contract: both paths are bit-for-bit the math of
`ops.stencils.jacobi_step` — the kernel body *calls that same jnp code* on
VMEM-resident values, so kernel≡oracle holds by construction (SURVEY.md §4
rung 4). Arbitrary H×W is handled by padding to the fp32 (8,128) VMEM tile
grid (SURVEY.md §7 "(8,128) tiling & alignment") with an edge-replication
invariant: the pad region always equals the replicated true edge, re-asserted
after every sweep, which makes clamped-boundary reads at the true boundary
exact even though the kernel computes on the padded grid.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.ops import stencils

# fp32 VMEM tile is (8, 128) sublanes x lanes (pallas guide: tiling constraints).
_SUBLANE = 8
_LANE = 128

# VMEM working-set budget for the whole-image path. v5e VMEM is large enough
# for ~1 Mpx fp32 with all 8 operands + temporaries; measured headroom factor
# of 14 arrays. Overridable for tuning on other TPU generations.
_VMEM_BUDGET = int(os.environ.get("HSFLOW_VMEM_BUDGET", str(100 * 1024 * 1024)))
_VMEM_ARRAYS = 14

# Row-band height for the banded path (multiple of the sublane tile).
_BAND_ROWS = int(os.environ.get("HSFLOW_BAND_ROWS", "256"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to_tiles(a: jnp.ndarray, rows: int, cols: int, edge: bool) -> jnp.ndarray:
    """Pad the last two axes up to (rows, cols); edge-replicate or zero-fill."""
    h, w = a.shape[-2:]
    if h == rows and w == cols:
        return a
    widths = [(0, 0)] * (a.ndim - 2) + [(0, rows - h), (0, cols - w)]
    return jnp.pad(a, widths, mode="edge" if edge else "constant")


def _replicate_pad(x: jnp.ndarray, h: int, w: int, rows, cols) -> jnp.ndarray:
    """Re-assert the pad-region == replicated-true-edge invariant.

    `rows`/`cols` are broadcasted iota index grids of x's (padded) shape;
    h, w are the true sizes (trace-static). Row fix first, then column fix on
    the row-fixed value so the corner pad picks up x[h-1, w-1].
    """
    hp, wp = x.shape[-2:]
    if h < hp:
        x = jnp.where(rows >= h, x[..., h - 1 : h, :], x)
    if w < wp:
        x = jnp.where(cols >= w, x[..., :, w - 1 : w], x)
    return x


# -- whole-image VMEM-resident path -------------------------------------------


def _vmem_kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref,
                 *, n_sweeps: int, h: int, w: int):
    ex = ex_ref[...]
    ey = ey_ref[...]
    et = et_ref[...]
    invd = invd_ref[...]
    hp, wp = ex.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)

    def body(_, uv):
        u, v = stencils.jacobi_step(uv[0], uv[1], ex, ey, et, invd)
        u = _replicate_pad(u, h, w, rows, cols)
        v = _replicate_pad(v, h, w, rows, cols)
        return (u, v)

    u, v = jax.lax.fori_loop(0, n_sweeps, body, (u0_ref[...], v0_ref[...]))
    uo_ref[...] = u
    vo_ref[...] = v


def _sweeps_vmem(u, v, ex, ey, et, invd, n_sweeps: int, h: int, w: int,
                 interpret: bool):
    hp, wp = u.shape
    out = jax.ShapeDtypeStruct((hp, wp), u.dtype)
    kernel = functools.partial(_vmem_kernel, n_sweeps=n_sweeps, h=h, w=w)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out),
        in_specs=[spec] * 6,
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024
        ),
        interpret=interpret,
    )(ex, ey, et, invd, u, v)


# -- row-banded path (frames too large for VMEM) -------------------------------


def _banded_kernel(ex_ref, ey_ref, et_ref, invd_ref,
                   u_prev, u_cur, u_next, v_prev, v_cur, v_next,
                   uo_ref, vo_ref, *, h: int, w: int, band: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    wp = ex_ref.shape[-1]

    def assemble(prev, cur, nxt):
        # 1-row halo each side; at the global top/bottom the halo is the
        # band's own edge row (replicate clamp), matching ops.stencils.
        top = jnp.where(i == 0, cur[:1, :], prev[-1:, :])
        bot = jnp.where(i == nb - 1, cur[-1:, :], nxt[:1, :])
        return jnp.concatenate([top, cur, bot], axis=0)

    u = assemble(u_prev[...], u_cur[...], u_next[...])
    v = assemble(v_prev[...], v_cur[...], v_next[...])
    # jacobi_step's clamped shifts are exact on the interior rows [1, band]
    # that we keep; its clamping only affects the halo rows we discard.
    un, vn = stencils.jacobi_step(
        u, v,
        jnp.concatenate([ex_ref[:1, :], ex_ref[...], ex_ref[-1:, :]], axis=0),
        jnp.concatenate([ey_ref[:1, :], ey_ref[...], ey_ref[-1:, :]], axis=0),
        jnp.concatenate([et_ref[:1, :], et_ref[...], et_ref[-1:, :]], axis=0),
        jnp.concatenate([invd_ref[:1, :], invd_ref[...], invd_ref[-1:, :]], axis=0),
    )
    un = un[1 : band + 1, :]
    vn = vn[1 : band + 1, :]
    # Edge-replication invariant on the pad region, using global row indices.
    rows = i * band + jax.lax.broadcasted_iota(jnp.int32, (band, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (band, wp), 1)
    hp = nb * band
    if h < hp:
        # The pad rows and true row h-1 share the last band (pad < band),
        # so the in-band row index of the true edge row is static.
        local_edge = (h - 1) % band
        un = jnp.where(rows >= h, un[local_edge : local_edge + 1, :], un)
        vn = jnp.where(rows >= h, vn[local_edge : local_edge + 1, :], vn)
    if w < wp:
        un = jnp.where(cols >= w, un[:, w - 1 : w], un)
        vn = jnp.where(cols >= w, vn[:, w - 1 : w], vn)
    uo_ref[...] = un
    vo_ref[...] = vn


def _sweep_banded(u, v, ex, ey, et, invd, h: int, w: int, interpret: bool):
    """One full-image Jacobi sweep via a 1-D grid over row bands."""
    hp, wp = u.shape
    band = min(_BAND_ROWS, hp)
    nb = hp // band
    out = jax.ShapeDtypeStruct((hp, wp), u.dtype)

    def banded(idx):
        return pl.BlockSpec((band, wp), lambda i: (idx(i), 0), memory_space=pltpu.VMEM)

    cur = lambda i: i
    prev = lambda i: jnp.maximum(i - 1, 0)
    nxt = lambda i: jnp.minimum(i + 1, nb - 1)
    kernel = functools.partial(_banded_kernel, h=h, w=w, band=band)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(out, out),
        in_specs=[banded(cur)] * 4
        + [banded(prev), banded(cur), banded(nxt)] * 2,
        out_specs=(banded(cur), banded(cur)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ex, ey, et, invd, u, u, u, v, v, v)


# -- public entry --------------------------------------------------------------


def jacobi_sweeps(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n_sweeps: int,
    block_sweeps: int = 1,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run n fused Jacobi sweeps on TPU; exact twin of the jnp sweep loop.

    Strategy is chosen by padded-image VMEM footprint: whole-image VMEM
    residency when it fits (one launch, all sweeps on-chip), else row-banded
    launches chained in a fori_loop. `block_sweeps` is accepted for config
    compatibility; the VMEM path always blocks maximally and the banded path
    currently exchanges per sweep (s>1 banded blocking: SURVEY.md §7).
    """
    if u.ndim != 2:
        raise ValueError(f"jacobi_sweeps expects 2-D fields, got {u.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = u.shape
    hp = _round_up(h, _SUBLANE)
    wp = _round_up(w, _LANE)
    dtype_bytes = jnp.dtype(u.dtype).itemsize
    fits_vmem = hp * wp * dtype_bytes * _VMEM_ARRAYS <= _VMEM_BUDGET

    if not fits_vmem:
        hp = _round_up(h, min(_BAND_ROWS, _round_up(h, _SUBLANE)))

    pads = dict(rows=hp, cols=wp)
    u = pad_to_tiles(u, edge=True, **pads)
    v = pad_to_tiles(v, edge=True, **pads)
    ex = pad_to_tiles(ex, edge=False, **pads)
    ey = pad_to_tiles(ey, edge=False, **pads)
    et = pad_to_tiles(et, edge=False, **pads)
    invd = pad_to_tiles(inv_den, edge=False, **pads)

    if fits_vmem:
        uo, vo = _sweeps_vmem(u, v, ex, ey, et, invd, n_sweeps, h, w, interpret)
    else:
        def body(_, uv):
            return _sweep_banded(uv[0], uv[1], ex, ey, et, invd, h, w, interpret)

        uo, vo = jax.lax.fori_loop(0, n_sweeps, body, (u, v))
    return uo[:h, :w], vo[:h, :w]
