"""VMEM-resident fused TV-L1 inner loop (round-5 VERDICT item 2).

TV-L1's per-warp inner alternation (tvl1.py::tvl1_warp_iteration `body`) is
~55 elementwise ops plus 1-px shifts over a 6-field state — on the jnp/XLA
path every iteration streams tens of full arrays through HBM, which is why
the family table showed 543 ms/frame at 1080p (the accuracy champion, 65x
the HS pipeline). This kernel runs ALL `iters` alternations of one warp
iteration in ONE Pallas launch with everything resident in VMEM:

  * Residents: the 6 state fields (u1, u2, p1x, p1y, p2x, p2y) live in
    OUTPUT refs (scratch-ref loop state compiles pathologically slowly —
    kernels/jacobi.py round-1 finding); the 5 loop-constant fields (rho0,
    gx, gy, 1/g2, th) are DMA'd from HBM into VMEM scratch once at entry.
    11 full arrays — beyond the HS resident kernel's 8, still inside the
    1080p budget at a slightly higher band count.
  * The iteration updates IN PLACE — no ping-pong pairs and no decaying
    halo rings. Per iteration, two banded passes with a strict version
    discipline:
      pass 1 (u-step): per band, v = prox_data(u_prev) is elementwise on
        the band's own rows, and theta*div(p_prev) reads p rows
        [r0-1, r0+band) — p is untouched until pass 2, so every read sees
        the previous iteration's p. Writes u_new for the band.
      pass 2 (p-step): per band, grad(u_new) reads u rows [r0, r0+band]
        — all bands' u were written in pass 1 — and the projected dual
        ascent update of p reads only the band's OWN p rows (elementwise).
    No cross-band read ever sees a half-updated version, so banded ==
    whole-array, exactly (not just to float tolerance).
  * Boundary handling mirrors the jnp ops bitwise: forward-difference
    gradients carry their structural zero at the last column/row (clamp
    at the TRUE image edge via masks when the padded array is larger);
    the dual fields' structural zeros (tvl1.py::_mask_dual) hold by
    induction — d = 0 and p = 0 there => (p + sigma*d)/n = 0 exactly.
  * Division is kept as division (not reciprocal-multiply) so the
    arithmetic matches the jnp twin to the ULP.

The warp, median filter, and pyramid stay at the XLA level (tvl1.py); the
kernel covers exactly the fori_loop they wrap. Gradients ride the same
custom_vjp scheme as the other whole-solve kernels: kernel forward,
jnp-twin backward (the twin IS the oracle body).

Parity note: the reference app class (SURVEY.md §2a) has no TV-L1 at all —
this is performance work on a capability extension, held to the same
kernel == oracle bar as the HS kernels (SURVEY.md §4 rung 4).
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
    _round_up,
    _sublane,
    pad_to_tiles,
)

# 6 state refs + 5 constant scratch arrays, full (hp, wp); band-sized
# temporaries for the two passes (windows, grads, norms, projections).
_RESIDENT_ARRAYS = 11
_TEMP_ARRAYS = 12
_LIMIT = int(os.environ.get("HSFLOW_TVL1_VMEM", str(118 * 1024 * 1024)))
_FORCE_NB = int(os.environ.get("HSFLOW_TVL1_NB", "0"))  # 0 = auto


def pick_geometry(h: int, w: int, dtype):
    """Smallest band count whose residency estimate fits the budget, or
    None (the caller falls back to the jnp path)."""
    sub = _sublane(dtype)
    nbytes = jnp.dtype(dtype).itemsize
    wp = _round_up(w, _LANE)
    h_units = -(-h // sub)
    for nb in range(1, h_units + 1):
        if _FORCE_NB and nb != _FORCE_NB:
            continue
        units = -(-h_units // nb)
        band = units * sub
        hp = band * nb
        resident = _RESIDENT_ARRAYS * hp * wp * nbytes
        temps = _TEMP_ARRAYS * (band + sub) * wp * nbytes
        if _FORCE_NB or resident + temps <= _LIMIT:
            return nb, band, hp, wp
    return None


def _zsr(a):
    """zshift_right_col on a band window: zero-fill at (global) column 0,
    which is always the array edge (columns are not banded)."""
    return jnp.concatenate(
        [jnp.zeros_like(a[:, :1]), a[:, : a.shape[1] - 1]], axis=1
    )


def _tvl1_kernel(u1_h, u2_h, rho0_h, gx_h, gy_h, ig_h, th_h,
                 u1o, u2o, p1x, p1y, p2x, p2y,
                 r0s, gxs, gys, igs, ths, sem, *,
                 nb: int, band: int, hp: int, wp: int, h: int, w: int,
                 iters: int, theta: float, sigma: float, lam_theta: float):
    sub = _sublane(u1o.dtype)
    # ---- entry: DMA state + constants into residence, zero the duals ----
    for src, dst in ((u1_h, u1o), (u2_h, u2o), (rho0_h, r0s), (gx_h, gxs),
                     (gy_h, gys), (ig_h, igs), (th_h, ths)):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()
    z = jnp.zeros((hp, wp), u1o.dtype)
    p1x[...] = z
    p1y[...] = z
    p2x[...] = z
    p2y[...] = z

    # Right-edge mask: the forward difference's structural zero must sit at
    # the TRUE last column w-1 when w < wp (pad columns hold garbage that
    # true columns never read back). w == wp needs no mask: the clamped
    # concat shift makes the difference exactly zero at the array edge.
    if w == wp:
        m_rt = None
    else:
        gc = jax.lax.broadcasted_iota(jnp.int32, (band, wp), 1)
        m_rt = gc == w - 1

    def pass1(b):
        """u-step for band b: reads u (own rows) and p (rows r0-1..)."""
        r0 = b * band
        sl = pl.ds(r0, band)
        u1b = u1o[sl]
        u2b = u2o[sl]
        gxb = gxs[sl]
        gyb = gys[sl]
        # prox of the L1 data term — association order mirrors tvl1.py
        rho = r0s[sl] + u1b * gxb + u2b * gyb
        thb = ths[sl]
        step = jnp.where(
            rho < -thb,
            lam_theta,
            jnp.where(rho > thb, -lam_theta, -rho * igs[sl]),
        )
        v1 = u1b + step * gxb
        v2 = u2b + step * gyb

        def div(px_ref, py_ref):
            pxb = px_ref[sl]
            if b == 0:
                pyb = py_ref[sl]
                py_sh = jnp.concatenate(
                    [jnp.zeros((1, wp), pxb.dtype), pyb[: band - 1]], axis=0
                )
            else:
                pw = py_ref[pl.ds(r0 - sub, band + sub)]
                pyb = pw[sub:]
                py_sh = pw[sub - 1 : sub - 1 + band]
            return (pxb - _zsr(pxb)) + (pyb - py_sh)

        u1o[sl] = v1 + theta * div(p1x, p1y)
        u2o[sl] = v2 + theta * div(p2x, p2y)

    def pass2(b):
        """p-step for band b: reads u_new (rows r0..r0+band) and its OWN
        p rows; projected dual ascent, in place."""
        r0 = b * band
        sl = pl.ds(r0, band)
        last = b == nb - 1
        rows = band if last else band + sub
        if last and h != hp:
            gr = r0 + jax.lax.broadcasted_iota(jnp.int32, (band, wp), 0)
            m_bot = gr == h - 1
        else:
            m_bot = None

        def grads(u_ref):
            uw = u_ref[pl.ds(r0, rows)]
            ub = uw[:band]
            if last:
                u_dn = jnp.concatenate([uw[1:band], uw[band - 1 : band]],
                                       axis=0)
            else:
                u_dn = uw[1 : band + 1]
            dx = jnp.concatenate([ub[:, 1:], ub[:, wp - 1 :]], axis=1) - ub
            if m_rt is not None:
                dx = jnp.where(m_rt, 0.0, dx)
            dy = u_dn - ub
            if m_bot is not None:
                dy = jnp.where(m_bot, 0.0, dy)
            return dx, dy

        def project(px_ref, py_ref, dx, dy):
            n = 1.0 + sigma * jnp.sqrt(dx * dx + dy * dy)
            px_ref[sl] = (px_ref[sl] + sigma * dx) / n
            py_ref[sl] = (py_ref[sl] + sigma * dy) / n

        d1x, d1y = grads(u1o)
        project(p1x, p1y, d1x, d1y)
        d2x, d2y = grads(u2o)
        project(p2x, p2y, d2x, d2y)

    def iteration(_, c):
        for b in range(nb):
            pass1(b)
        for b in range(nb):
            pass2(b)
        return c

    jax.lax.fori_loop(0, iters, iteration, 0)


def _inner_impl(u1, u2, rho0, gx, gy, inv_g2, th, iters, theta, sigma,
                lam_theta, geom, interpret):
    h, w = u1.shape
    nb, band, hp, wp = geom
    args = [pad_to_tiles(a, hp, wp)
            for a in (u1, u2, rho0, gx, gy, inv_g2, th)]
    out = jax.ShapeDtypeStruct((hp, wp), u1.dtype)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        functools.partial(
            _tvl1_kernel, nb=nb, band=band, hp=hp, wp=wp, h=h, w=w,
            iters=iters, theta=theta, sigma=sigma, lam_theta=lam_theta,
        ),
        out_shape=(out,) * 6,
        in_specs=[any_spec] * 7,
        out_specs=(vmem,) * 6,
        scratch_shapes=[pltpu.VMEM((hp, wp), u1.dtype)] * 5
        + [pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_LIMIT + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return res[0][:h, :w], res[1][:h, :w]


def _jnp_twin(u1, u2, rho0, gx, gy, inv_g2, th, iters, theta, sigma,
              lam_theta):
    """The oracle body (tvl1.py::tvl1_warp_iteration inner loop), for the
    backward pass and the equivalence tests. sqrt(n)-checkpointed like the
    other solver twins (O(sqrt n) gradient memory)."""
    from opticalflowhs_tpu.ops import stencils
    from opticalflowhs_tpu.tvl1 import (
        _mask_dual,
        _safe_norm,
        divergence,
        grad_forward,
    )

    def body(state):
        u1, u2, p1x, p1y, p2x, p2y = state
        rho = rho0 + u1 * gx + u2 * gy
        step = jnp.where(
            rho < -th,
            lam_theta,
            jnp.where(rho > th, -lam_theta, -rho * inv_g2),
        )
        v1 = u1 + step * gx
        v2 = u2 + step * gy
        u1 = v1 + theta * divergence(p1x, p1y)
        u2 = v2 + theta * divergence(p2x, p2y)
        d1x, d1y = grad_forward(u1)
        d2x, d2y = grad_forward(u2)
        n1 = 1.0 + sigma * _safe_norm(d1x, d1y)
        n2 = 1.0 + sigma * _safe_norm(d2x, d2y)
        p1x, p1y = _mask_dual((p1x + sigma * d1x) / n1,
                              (p1y + sigma * d1y) / n1)
        p2x, p2y = _mask_dual((p2x + sigma * d2x) / n2,
                              (p2y + sigma * d2y) / n2)
        return u1, u2, p1x, p1y, p2x, p2y

    z = jnp.zeros_like(u1)
    state = stencils.checkpointed_loop(body, (u1, u2, z, z, z, z), iters)
    return state[0], state[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _inner_ad(u1, u2, rho0, gx, gy, inv_g2, th, iters, theta, sigma,
              lam_theta, geom, interpret):
    return _inner_impl(u1, u2, rho0, gx, gy, inv_g2, th, iters, theta,
                       sigma, lam_theta, geom, interpret)


def _inner_fwd(u1, u2, rho0, gx, gy, inv_g2, th, iters, theta, sigma,
               lam_theta, geom, interpret):
    out = _inner_impl(u1, u2, rho0, gx, gy, inv_g2, th, iters, theta,
                      sigma, lam_theta, geom, interpret)
    return out, (u1, u2, rho0, gx, gy, inv_g2, th)


def _inner_bwd(iters, theta, sigma, lam_theta, geom, interpret, res, ct):
    u1, u2, rho0, gx, gy, inv_g2, th = res
    _, vjp = jax.vjp(
        lambda *a: _jnp_twin(*a, iters, theta, sigma, lam_theta),
        u1, u2, rho0, gx, gy, inv_g2, th,
    )
    return vjp(ct)


_inner_ad.defvjp(_inner_fwd, _inner_bwd)


def tvl1_inner(
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    rho0: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    inv_g2: jnp.ndarray,
    th: jnp.ndarray,
    iters: int,
    theta: float,
    sigma: float,
    lam_theta: float,
    interpret: bool | None = None,
):
    """Run `iters` TV-L1 v/u alternations in ONE Pallas launch with the
    full state resident in VMEM. Returns (u1, u2) or None when the frame
    is outside the residency class (caller falls back to the jnp loop).
    Exact twin of the tvl1.py inner loop; differentiable via the
    whole-loop custom_vjp against it."""
    if u1.ndim != 2 or iters < 1:
        return None
    geom = pick_geometry(*u1.shape, u1.dtype)
    if geom is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _inner_ad(u1, u2, rho0, gx, gy, inv_g2, th, iters,
                     float(theta), float(sigma), float(lam_theta), geom,
                     interpret)
