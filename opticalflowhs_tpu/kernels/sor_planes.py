"""Color-plane-compressed 4-color SOR whole-sweep kernel (round 5).

The where-blend resident SOR kernel (kernels/solve_resident.py, stages=4)
computes TWO full-resolution neighborhood averages per color stage and
keeps 3/4 of every result masked off — 4.3x a Jacobi sweep's work for one
SOR sweep. This module stores u, v, and the four fields as their four
(row%2, col%2) parity PLANES instead: a color stage then touches exactly
one quarter-resolution plane with NO masks and NO wasted lanes, and the
whole sweep costs ~32 full-resolution-equivalent ops — ~1.2x a Jacobi
sweep — instead of ~128.

Bitwise exactness (the oracle invariant, CLAUDE.md): the separable
[1,2,1] passes of ops/stencils.neighbor_avg restricted to one parity are
sums of the SAME three values in the SAME order, just gathered from
planes — vertical pass t(i,j) = u(i-1,j) + 2u(i,j) + u(i+1,j) mixes the
two row-parity planes of column parity j%2; horizontal pass
s = t(j-1) + 2t(j) + t(j+1) mixes the two T column parities — so every
intermediate float equals the full-resolution computation exactly.
Replicate clamps at the true image edges land on specific plane rows/
columns depending on h/w parity (a clamp at an even boundary row fixes
the pi=0 planes, at an odd one the pi=1 planes); those single-row/column
`where` fixes are the only masks in the kernel.

Because a stage overwrites ONLY its own plane and later stages read the
updated value (Gauss-Seidel ordering), the update is IN PLACE: no
ping-pong pairs, no inter-band decay halos, no banding at all — the
whole-image plane set fits VMEM for frames up to ~2.8 Mpx fp32 (the SOR
resident class). Plane packing/unpacking (lane-stride-2 relayouts) runs
once per solve at the XLA level, outside the kernel.

Derivatives ride the existing fused pass (kernels/derivatives.py) and are
plane-split at the XLA level; gradients ride the whole-solve custom_vjp
scheme with the same jnp twin as the other SOR kernels.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.kernels.jacobi import _round_up, pad_to_tiles
from opticalflowhs_tpu.kernels.solve_resident import _jnp_twin_sor

# 24 plane arrays (16 field + 8 aliased u/v state) = 6 full-res
# equivalents, plus ~18 live plane temporaries across a stage = 4.5
# full-res equivalents.
_FULL_EQUIV = 11
_LIMIT = int(os.environ.get("HSFLOW_SOR_PLANES_VMEM",
                            str(112 * 1024 * 1024)))


def applicable_shape(h: int, w: int, dtype) -> tuple | None:
    """(hp, wp) when the whole plane set fits VMEM, else None."""
    nbytes = jnp.dtype(dtype).itemsize
    hp = _round_up(h, 16)    # plane rows stay sublane-aligned
    wp = _round_up(w, 256)   # plane cols stay lane-aligned
    if _FULL_EQUIV * hp * wp * nbytes <= _LIMIT:
        return hp, wp
    return None


def _planes(a):
    return a[0::2, 0::2], a[0::2, 1::2], a[1::2, 0::2], a[1::2, 1::2]


def _interleave(p00, p01, p10, p11):
    h2, w2 = p00.shape
    r0 = jnp.stack([p00, p01], axis=-1).reshape(h2, 2 * w2)
    r1 = jnp.stack([p10, p11], axis=-1).reshape(h2, 2 * w2)
    return jnp.stack([r0, r1], axis=1).reshape(2 * h2, 2 * w2)


def _planes_kernel(*refs, h: int, w: int, h2: int, w2: int,
                   n_sweeps: int, omega: float, zero_init: bool):
    # refs: 16 field-plane inputs, then (warm start only) 8 u/v-plane
    # inputs aliased onto the 8 u/v-plane outputs that follow. The kernel
    # reads/writes state through the OUTPUT refs only — with aliasing
    # they already hold the warm-start values at entry; zero-init skips
    # the state inputs and writes zeros here.
    n_in = 16 if zero_init else 24
    F = {}
    for fi, name in enumerate(("ex", "ey", "et", "ivd")):
        for ci, c in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            F[(name, c)] = refs[4 * fi + ci]
    U = {c: refs[n_in + ci]
         for ci, c in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))}
    V = {c: refs[n_in + 4 + ci]
         for ci, c in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))}
    if zero_init:
        z = jnp.zeros((h2, w2), refs[0].dtype)
        for c in U:
            U[c][...] = z
            V[c][...] = z

    h_odd = h % 2 == 1
    w_odd = w % 2 == 1
    # Single-row/column true-edge fixes: the bottom clamp row h-1 lives in
    # the pi = (h-1)%2 planes at plane row (h-1)//2; likewise columns.
    gr2 = jax.lax.broadcasted_iota(jnp.int32, (h2, w2), 0)
    gc2 = jax.lax.broadcasted_iota(jnp.int32, (h2, w2), 1)
    m_bot = gr2 == (h - 1) // 2   # applies to planes of parity (h-1)%2
    m_rt = gc2 == (w - 1) // 2    # applies to planes of parity (w-1)%2

    def tpass(P, pi, pjc):
        """Vertical [1,2,1] pass at (row parity pi, col parity pjc):
        t = u(i-1) + 2u(i) + u(i+1), clamped at the true top/bottom."""
        center = P[(pi, pjc)][...]
        other = P[(1 - pi, pjc)][...]
        if pi == 0:
            # u(i-1) of row 2r is plane-1 row r-1; row 0 clamps to center
            up = jnp.concatenate([center[0:1], other[: h2 - 1]], axis=0)
            dn = other  # u(i+1) of row 2r is plane-1 row r
            if h_odd:   # true bottom row h-1 is even: clamp to center
                dn = jnp.where(m_bot, center, dn)
        else:
            up = other  # u(i-1) of row 2r+1 is plane-0 row r
            dn = jnp.concatenate([other[1:], other[h2 - 1:]], axis=0)
            if not h_odd:  # true bottom row h-1 is odd: clamp to center
                dn = jnp.where(m_bot, center, dn)
        return up + 2.0 * center + dn

    def navg_plane(P, pi, pj):
        """neighbor_avg restricted to color (pi, pj), bitwise."""
        t_same = tpass(P, pi, pj)
        t_other = tpass(P, pi, 1 - pj)
        if pj == 0:
            lf = jnp.concatenate(
                [t_same[:, 0:1], t_other[:, : w2 - 1]], axis=1
            )
            rt = t_other
            if w_odd:
                rt = jnp.where(m_rt, t_same, rt)
        else:
            lf = t_other
            rt = jnp.concatenate([t_other[:, 1:], t_other[:, w2 - 1:]],
                                 axis=1)
            if not w_odd:
                rt = jnp.where(m_rt, t_same, rt)
        s = lf + 2.0 * t_same + rt
        return s * (1.0 / 12.0) - P[(pi, pj)][...] * (1.0 / 3.0)

    def sweep(_, carry):
        for c in ((0, 0), (0, 1), (1, 0), (1, 1)):
            pi, pj = c
            ubar = navg_plane(U, pi, pj)
            vbar = navg_plane(V, pi, pj)
            frac = (F[("ex", c)][...] * ubar + F[("ey", c)][...] * vbar
                    + F[("et", c)][...]) * F[("ivd", c)][...]
            un = ubar - F[("ex", c)][...] * frac
            vn = vbar - F[("ey", c)][...] * frac
            uc = U[c][...]
            vc = V[c][...]
            U[c][...] = uc + omega * (un - uc)
            V[c][...] = vc + omega * (vn - vc)
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, 0)


def _solve_impl(i1, i2, u0, v0, alpha, n_sweeps, omega, variant, geom,
                interpret):
    from opticalflowhs_tpu.kernels.derivatives import derivatives_precompute

    h, w = i1.shape
    hp, wp = geom
    h2, w2 = hp // 2, wp // 2
    ex, ey, et, ivd = derivatives_precompute(i1, i2, alpha, variant,
                                             interpret=interpret)
    field_planes = []
    for f in (ex, ey, et, ivd):
        field_planes.extend(_planes(pad_to_tiles(f, hp, wp)))
    zero_init = u0 is None
    if zero_init:
        state_planes = []
        aliases = {}
    else:
        state_planes = list(_planes(pad_to_tiles(u0.astype(i1.dtype),
                                                 hp, wp)))
        state_planes += list(_planes(pad_to_tiles(v0.astype(i1.dtype),
                                                  hp, wp)))
        aliases = {16 + i: i for i in range(8)}
    out = jax.ShapeDtypeStruct((h2, w2), i1.dtype)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        functools.partial(
            _planes_kernel, h=h, w=w, h2=h2, w2=w2, n_sweeps=n_sweeps,
            omega=omega, zero_init=zero_init,
        ),
        out_shape=(out,) * 8,
        in_specs=[vmem] * (16 + len(state_planes)),
        out_specs=(vmem,) * 8,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_LIMIT + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*field_planes, *state_planes)
    u = _interleave(*res[0:4])[:h, :w]
    v = _interleave(*res[4:8])[:h, :w]
    return u, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _sor_planes_zero_ad(i1, i2, alpha, n_sweeps, omega, variant, geom,
                        interpret):
    return _solve_impl(i1, i2, None, None, alpha, n_sweeps, omega, variant,
                       geom, interpret)


def _zero_fwd(i1, i2, alpha, n_sweeps, omega, variant, geom, interpret):
    out = _solve_impl(i1, i2, None, None, alpha, n_sweeps, omega, variant,
                      geom, interpret)
    return out, (i1, i2)


def _zero_bwd(alpha, n_sweeps, omega, variant, geom, interpret, res, ct):
    i1, i2 = res
    _, vjp = jax.vjp(
        lambda a, b: _jnp_twin_sor(a, b, None, None, alpha, n_sweeps,
                                   omega, variant),
        i1, i2,
    )
    return vjp(ct)


_sor_planes_zero_ad.defvjp(_zero_fwd, _zero_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _sor_planes_warm_ad(i1, i2, u0, v0, alpha, n_sweeps, omega, variant,
                        geom, interpret):
    return _solve_impl(i1, i2, u0, v0, alpha, n_sweeps, omega, variant,
                       geom, interpret)


def _warm_fwd(i1, i2, u0, v0, alpha, n_sweeps, omega, variant, geom,
              interpret):
    out = _solve_impl(i1, i2, u0, v0, alpha, n_sweeps, omega, variant,
                      geom, interpret)
    return out, (i1, i2, u0, v0)


def _warm_bwd(alpha, n_sweeps, omega, variant, geom, interpret, res, ct):
    i1, i2, u0, v0 = res
    _, vjp = jax.vjp(
        lambda a, b, uu, vv: _jnp_twin_sor(a, b, uu, vv, alpha, n_sweeps,
                                           omega, variant),
        i1, i2, u0, v0,
    )
    return vjp(ct)


_sor_planes_warm_ad.defvjp(_warm_fwd, _warm_bwd)


def hs_solve_sor_planes(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    alpha: float,
    n_sweeps: int,
    omega: float,
    variant: str = "hs_cube",
    u0: jnp.ndarray | None = None,
    v0: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Whole 4-color SOR solve on color planes: derivatives (fused pass) +
    every sweep on VMEM-resident quarter-resolution parity planes, updated
    in place under the exact Gauss-Seidel ordering. Returns (u, v) or None
    outside the plane-residency class (caller falls back to the
    where-blend resident kernel, then banded). Bitwise twin of
    ops.stencils.sor_step loops; differentiable via the whole-solve
    custom_vjp against the same jnp twin as the other SOR kernels."""
    if (u0 is None) != (v0 is None):
        raise ValueError("u0 and v0 must be given together")
    if i1.ndim != 2 or n_sweeps < 1 or variant != "hs_cube":
        return None
    geom = applicable_shape(*i1.shape, i1.dtype)
    if geom is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    alpha = float(alpha)
    omega = float(omega)
    if u0 is None:
        return _sor_planes_zero_ad(i1, i2, alpha, n_sweeps, omega, variant,
                                   geom, interpret)
    return _sor_planes_warm_ad(i1, i2, u0, v0, alpha, n_sweeps, omega,
                               variant, geom, interpret)
