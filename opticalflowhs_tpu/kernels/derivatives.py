"""Fused Pallas derivative kernel (component N5 scope; reference R1).

Computes Ex, Ey, Et (SURVEY.md §2.5 eq. D — the HS81 2x2x2 cube estimator,
or the central variant) AND the hoisted 1/(alpha^2 + Ex^2 + Ey^2) in ONE
banded pass over the frames: reads i1, i2 once, writes the four
loop-invariant fields once. The XLA lowering of the same math costs ~25%
of a 1080p solve at iters=20 (measured, tools/hw_prologue_bf16.py) because
it round-trips several shift-concat fusions through HBM; at iters=100 the
prologue hides behind the first sweep block, so this kernel matters for
the low-iteration video presets (driver config 4).

Same arithmetic association order as ops/stencils.py::derivatives, so the
oracle-equivalence chain (SURVEY.md §4 rung 4) extends through it.
Batched (B, H, W) stacks run on a (B, bands) grid.
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
    _cshift,
    _round_up,
    _shift,
    _sublane,
    pad_to_tiles,
)

# Per-band working set: 2 input bands + slabs + 4 outputs + temporaries.
_DERIV_ARRAYS = 14


def _deriv_kernel(i1_ref, i1t_ref, i1b_ref, i2_ref, i2t_ref, i2b_ref,
                  ex_ref, ey_ref, et_ref, invd_ref, *,
                  halo: int, band: int, h: int, w: int, alpha2: float,
                  variant: str):
    i = pl.program_id(1)

    def asm(b, t, bo):
        return jnp.concatenate([t[0], b[0], bo[0]], axis=0)

    f1 = asm(i1_ref, i1t_ref, i1b_ref)
    f2 = asm(i2_ref, i2t_ref, i2b_ref)
    th, wp = f1.shape
    local = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0)
    gr = i * band - halo + local
    gc = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1)
    m_top = gr == 0
    m_bot = gr == h - 1
    m_rt = None if w == wp else gc == w - 1

    def up(a):  # a(i+1), clamped at the true bottom edge
        return jnp.where(m_bot, a, _shift(a, th - 1, 0))

    def dn(a):  # a(i-1), clamped at the true top edge
        return jnp.where(m_top, a, _shift(a, 1, 0))

    def lc(a):  # a(j+1), clamped at the true right edge
        if m_rt is None:
            return _cshift(a, wp - 1, 1)
        return jnp.where(m_rt, a, _shift(a, wp - 1, 1))

    def rc(a):  # a(j-1); array col 0 is the true left edge
        return _cshift(a, 1, 1)

    if variant == "hs_cube":
        ex = jnp.zeros_like(f1)
        ey = jnp.zeros_like(f1)
        for f in (f1, f2):
            fr = up(f)
            fc = lc(f)
            frc = lc(fr)
            ex = ex + (fc - f) + (frc - fr)
            ey = ey + (fr - f) + (frc - fc)
        ex = ex * 0.25
        ey = ey * 0.25
        d = f2 - f1
        et = 0.25 * (d + up(d) + lc(d) + lc(up(d)))
    else:  # central
        ex = 0.5 * (lc(f1) - rc(f1))
        ey = 0.5 * (up(f1) - dn(f1))
        et = f2 - f1
    invd = 1.0 / (alpha2 + ex * ex + ey * ey)
    sl = slice(halo, halo + band)
    ex_ref[0] = ex[sl]
    ey_ref[0] = ey[sl]
    et_ref[0] = et[sl]
    invd_ref[0] = invd[sl]


def derivatives_precompute(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    alpha: float,
    variant: str = "hs_cube",
    interpret: bool | None = None,
):
    """(i1, i2) -> (Ex, Ey, Et, 1/(alpha^2+Ex^2+Ey^2)), one fused pass.

    Accepts (H, W) or (B, H, W); exact twin of
    stencils.derivatives + the inv_den hoist (solver.precompute).
    Differentiable via the same custom_vjp scheme as jacobi_sweeps
    (kernel forward, jnp-stencil-twin VJP backward).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _derivatives_ad(i1, i2, float(alpha), variant, interpret)


def _jnp_deriv_twin(i1, i2, alpha, variant):
    from opticalflowhs_tpu.ops import stencils

    ex, ey, et = stencils.derivatives(i1, i2, variant)
    invd = 1.0 / (alpha * alpha + ex * ex + ey * ey)
    return ex, ey, et, invd


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _derivatives_ad(i1, i2, alpha, variant, interpret):
    return _derivatives_impl(i1, i2, alpha, variant, interpret)


def _derivatives_ad_fwd(i1, i2, alpha, variant, interpret):
    return _derivatives_impl(i1, i2, alpha, variant, interpret), (i1, i2)


def _derivatives_ad_bwd(alpha, variant, interpret, res, ct):
    i1, i2 = res
    _, vjp = jax.vjp(
        lambda a, b: _jnp_deriv_twin(a, b, alpha, variant), i1, i2
    )
    return vjp(ct)


_derivatives_ad.defvjp(_derivatives_ad_fwd, _derivatives_ad_bwd)


def _derivatives_impl(i1, i2, alpha, variant, interpret,
                      band: int | None = None, hp_out: int | None = None,
                      crop: bool = True):
    """band/hp_out override the band layout (the fused whole-solve pipeline
    passes the sweep megakernel's geometry so its field inputs need no
    re-marshalling); crop=False returns the (B, hp, wp) padded fields.

    The i1/i2 halo slabs are BlockSpec VIEWS of the padded frames at
    clamped index maps (top slab of band i = rows [i*band-halo, i*band),
    i.e. halo-block i*band/halo - 1) — no XLA slab concats; halo = sublane
    always divides the sublane-rounded band. Out-of-range clamped blocks
    (i = 0 top, last bottom) hold rows the true-edge derivative clamps
    never read, same argument as the sweep kernels' slab contents.
    """
    squeeze = i1.ndim == 2
    if squeeze:
        i1 = i1[None]
        i2 = i2[None]
    b, h, w = i1.shape
    sub = _sublane(i1.dtype)
    wp = _round_up(w, _LANE)
    dtype_bytes = jnp.dtype(i1.dtype).itemsize
    if band is None:
        # Fewest VMEM-fitting bands, split evenly — pad rows are wasted
        # compute (same policy as kernels/jacobi._pick_band).
        unit = wp * dtype_bytes * _DERIV_ARRAYS
        band_max = max(2 * sub, _VMEM_BUDGET // unit - 2 * sub)
        h_units = -(-h // sub)
        nb_min = -(-h_units // max(2, band_max // sub))
        band = -(-h_units // max(1, nb_min)) * sub
    hp = _round_up(h, band) if hp_out is None else hp_out
    nb = hp // band
    halo = sub  # 1 needed; sublane-rounded for the Mosaic block shape
    r = band // halo
    f1 = pad_to_tiles(i1, hp, wp)
    f2 = pad_to_tiles(i2, hp, wp)

    band_spec = pl.BlockSpec(
        (1, band, wp), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM
    )
    top_spec = pl.BlockSpec(
        (1, halo, wp),
        lambda k, i: (k, jnp.maximum(i * r - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, halo, wp),
        lambda k, i: (k, jnp.minimum((i + 1) * r, nb * r - 1), 0),
        memory_space=pltpu.VMEM,
    )
    out = jax.ShapeDtypeStruct((b, hp, wp), i1.dtype)
    ex, ey, et, invd = pl.pallas_call(
        functools.partial(
            _deriv_kernel, halo=halo, band=band, h=h, w=w,
            alpha2=float(alpha) * float(alpha), variant=variant,
        ),
        grid=(b, nb),
        out_shape=(out, out, out, out),
        in_specs=[band_spec, top_spec, bot_spec] * 2,
        out_specs=(band_spec,) * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f1, f1, f1, f2, f2, f2)
    if not crop:
        sq = (lambda a: a[0]) if squeeze else (lambda a: a)
        return sq(ex), sq(ey), sq(et), sq(invd)
    cr = (
        (lambda a: a[0, :h, :w]) if squeeze else (lambda a: a[:, :h, :w])
    )
    return cr(ex), cr(ey), cr(et), cr(invd)
