"""HW: SUBLANE-stacked [u; v] sweep formulation vs the shipped kernels.

Round 1/2 measured the LANE-stacked [u | v] full formulation slower
(27.2 vs 31.0 Gpx*sweeps/s at 1024x1280): the seam column masks force
roll+where on both lane shifts and the half-width slices/concat for
frac are lane-dim rearrangements. Stacking along SUBLANES instead keeps
every lane shift identical to the plain kernel, and the frac half
slices P[:th] / P[th:] and concat([frac, frac], axis=0) are cheap
sublane-dim ops. Per sweep the stacked form runs ~19 stacked ops
(each covering both fields) + 3 half ops versus ~40 full ops — about
half the per-op dispatch count at equal arithmetic.

  U  = [u ; v]   (2th, w)      EX = [ex ; ey]
  Ubar = navg(U)               (sublane shifts masked at the u/v seam)
  P = EX * Ubar
  frac = (P[:th] + P[th:] + et) * invd          (half ops)
  U' = Ubar - EX * [frac ; frac]

Seam correctness: the sublane roll moves v's top row into u's bottom
neighborhood and vice versa, exactly where the HS clamp masks (built
from field row = local_row % th) replace the rolled value — same mod
trick as the batched stacked kernel's per-image clamp.

Probes: (a) whole-image VMEM stacked at 1024x1280 vs _sweeps_vmem;
(b) banded stacked at 1080p vs the shipped banded paths.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.kernels.jacobi import _cshift, _round_up, _VMEM_BUDGET


def _stacked_step(U, EX, et, invd, masks, th):
    """One Jacobi sweep on the (2th, w) stacked field."""
    m_top, m_bot, m_lf, m_rt = masks
    n2, w2 = U.shape

    def shr(a, m, shift):        # sublane shift, always masked (seam)
        return jnp.where(m, a, pltpu.roll(a, shift=shift, axis=0))

    def shc(a, m, shift):        # lane shift, same policy as plain kernel
        if m is None:
            return _cshift(a, shift, 1)
        return jnp.where(m, a, pltpu.roll(a, shift=shift, axis=1))

    up = shr(U, m_top, 1)
    dn = shr(U, m_bot, n2 - 1)
    t = up + 2.0 * U + dn
    rt = shc(t, m_lf, 1)
    lf = shc(t, m_rt, w2 - 1)
    s = rt + 2.0 * t + lf
    Ubar = s * (1.0 / 12.0) - U * (1.0 / 3.0)
    P = EX * Ubar
    frac = (P[:th] + P[th:] + et) * invd
    F2 = jnp.concatenate([frac, frac], axis=0)
    return Ubar - EX * F2


# -- (a) whole-image VMEM stacked ---------------------------------------------

def _vmem_stacked_kernel(ex2_ref, et_ref, invd_ref, u20_ref, uo_ref, *, n, h, w):
    EX = ex2_ref[...]
    et = et_ref[...]
    invd = invd_ref[...]
    n2, w2 = EX.shape
    th = n2 // 2
    local = jax.lax.broadcasted_iota(jnp.int32, (n2, w2), 0)
    fr = local % th                       # field row
    gc = jax.lax.broadcasted_iota(jnp.int32, (n2, w2), 1)
    m_top = fr == 0
    m_bot = fr == h - 1
    m_lf = None                           # col 0 is the true left edge
    m_rt = None if w == w2 else gc == w - 1
    masks = (m_top, m_bot, m_lf, m_rt)
    uo_ref[...] = u20_ref[...]

    def body(_, c):
        uo_ref[...] = _stacked_step(uo_ref[...], EX, et, invd, masks, th)
        return c
    jax.lax.fori_loop(0, n, body, 0)


def stacked_vmem_sweeps(u, v, ex, ey, et, invd, n):
    h, w = u.shape
    assert w % 128 == 0 and h % 8 == 0
    EX = jnp.concatenate([ex, ey], axis=0)
    U0 = jnp.concatenate([u, v], axis=0)
    out = jax.ShapeDtypeStruct((2 * h, w), u.dtype)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    U = pl.pallas_call(
        functools.partial(_vmem_stacked_kernel, n=n, h=h, w=w),
        out_shape=out,
        in_specs=[spec] * 4,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=108 * 1024 * 1024),
    )(EX, et, invd, U0)
    return U[:h], U[h:]


# -- (b) banded stacked --------------------------------------------------------

def _banded_stacked_kernel(u_ref, ut_ref, ub_ref, v_ref, vt_ref, vb_ref,
                           ex_ref, ext_ref, exb_ref, ey_ref, eyt_ref, eyb_ref,
                           et_ref, ett_ref, etb_ref, invd_ref, invdt_ref,
                           invdb_ref, uo_ref, vo_ref, *, s, halo, band, h, w):
    i = pl.program_id(0)

    def asm(band_ref, top_ref, bot_ref):
        return jnp.concatenate([top_ref[0], band_ref[...], bot_ref[0]], axis=0)

    U = jnp.concatenate([asm(u_ref, ut_ref, ub_ref),
                         asm(v_ref, vt_ref, vb_ref)], axis=0)
    EX = jnp.concatenate([asm(ex_ref, ext_ref, exb_ref),
                          asm(ey_ref, eyt_ref, eyb_ref)], axis=0)
    et = asm(et_ref, ett_ref, etb_ref)
    invd = asm(invd_ref, invdt_ref, invdb_ref)

    th, wp = et.shape                      # per-field rows in the window
    n2 = 2 * th
    local = jax.lax.broadcasted_iota(jnp.int32, (n2, wp), 0)
    fr = local % th
    gr = i * band - halo + fr
    gc = jax.lax.broadcasted_iota(jnp.int32, (n2, wp), 1)
    m_top = gr == 0
    m_bot = gr == h - 1
    m_lf = None
    m_rt = None if w == wp else gc == w - 1
    masks = (m_top, m_bot, m_lf, m_rt)
    for _k in range(s):
        U = _stacked_step(U, EX, et, invd, masks, th)
    uo_ref[...] = U[halo: halo + band]
    vo_ref[...] = U[th + halo: th + halo + band]


def stacked_banded_sweeps(u, v, ex, ey, et, invd, n_sweeps, s, band):
    h, w = u.shape
    assert w % 128 == 0
    hp = _round_up(h, band)
    halo = _round_up(s, 8)

    def padr(a):
        return jnp.pad(a, ((0, hp - h), (0, 0))) if hp != h else a

    u, v, ex, ey, et, invd = (padr(a) for a in (u, v, ex, ey, et, invd))
    nb = hp // band

    def slabs(x):
        b = x.reshape(nb, band, w)
        top = jnp.concatenate([b[:1, band - halo:], b[:-1, band - halo:]], axis=0)
        bot = jnp.concatenate([b[1:, :halo], b[-1:, :halo]], axis=0)
        return top, bot

    ut, ub = slabs(u)
    vt, vb = slabs(v)
    (ext, exb), (eyt, eyb), (ett, etb), (invdt, invdb) = (
        slabs(a) for a in (ex, ey, et, invd))

    band_spec = pl.BlockSpec((band, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, halo, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((hp, w), u.dtype)

    def block(uv, k):
        uts, ubs = slabs(uv[0])
        vts, vbs = slabs(uv[1])
        return pl.pallas_call(
            functools.partial(_banded_stacked_kernel, s=k, halo=halo,
                              band=band, h=h, w=w),
            grid=(nb,),
            out_shape=(out, out),
            in_specs=[band_spec, slab_spec, slab_spec] * 6,
            out_specs=(band_spec, band_spec),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024,
            ),
        )(uv[0], uts, ubs, uv[1], vts, vbs, ex, ext, exb, ey, eyt, eyb,
          et, ett, etb, invd, invdt, invdb)

    n_blocks, rem = divmod(n_sweeps, s)
    uv = (u, v)
    if n_blocks:
        uv = jax.lax.fori_loop(0, n_blocks, lambda _, x: block(x, s), uv)
    if rem:
        uv = block(uv, rem)
    return uv[0][:h], uv[1][:h]


def timeit(fn, n=10):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def fields(h, w, seed=0):
    rng = np.random.default_rng(seed)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    ex, ey, et = stencils.derivatives(i1, i2)
    invd = 1.0 / (0.25 + ex * ex + ey * ey)
    return jnp.zeros_like(ex), jnp.zeros_like(ex), ex, ey, et, invd


def oracle(u, v, ex, ey, et, invd, n):
    for _ in range(n):
        u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
    return u, v


if __name__ == "__main__":
    # (a) 1024x1280 whole-image VMEM
    h, w, iters = 1024, 1280, 100
    args = fields(h, w)
    f = jax.jit(functools.partial(stacked_vmem_sweeps, n=12))
    try:
        uo, vo = f(*args); float(jnp.sum(uo))
        ur, vr = oracle(*args, 12)
        print("vmem-stacked vs oracle max:",
              float(jnp.abs(uo - ur).max()), float(jnp.abs(vo - vr).max()),
              flush=True)
        g = jax.jit(functools.partial(stacked_vmem_sweeps, n=iters))
        d = timeit(lambda: g(*args))
        print(f"vmem-stacked  {h}x{w}/{iters}: {d*1e3:.3f} ms, "
              f"{h*w*iters/d/1e9:.2f} Gpx*sweeps/s", flush=True)
    except Exception as e:
        print("vmem-stacked: FAIL", str(e)[:300], flush=True)

    from opticalflowhs_tpu.kernels.jacobi import jacobi_sweeps
    g2 = jax.jit(functools.partial(jacobi_sweeps, n_sweeps=iters))
    d2 = timeit(lambda: g2(*args))
    print(f"shipped-vmem  {h}x{w}/{iters}: {d2*1e3:.3f} ms, "
          f"{h*w*iters/d2/1e9:.2f} Gpx*sweeps/s", flush=True)

    # (b) 1080p banded, band=272 s=16
    h, w, iters, s, band = 1088, 1920, 100, 16, 272
    args = fields(h, w)
    fb = jax.jit(functools.partial(stacked_banded_sweeps, n_sweeps=12, s=6, band=band))
    try:
        uo, vo = fb(*args); float(jnp.sum(uo))
        ur, vr = oracle(*args, 12)
        print("banded-stacked vs oracle max:",
              float(jnp.abs(uo - ur).max()), float(jnp.abs(vo - vr).max()),
              flush=True)
        gb = jax.jit(functools.partial(stacked_banded_sweeps, n_sweeps=iters, s=s, band=band))
        d = timeit(lambda: gb(*args))
        print(f"banded-stacked {h}x{w}/{iters} s{s} band{band}: {d*1e3:.3f} ms, "
              f"{h*w*iters/d/1e9:.2f} Gpx*sweeps/s", flush=True)
    except Exception as e:
        print("banded-stacked: FAIL", str(e)[:300], flush=True)

    g3 = jax.jit(functools.partial(jacobi_sweeps, n_sweeps=iters, block_sweeps=s))
    d3 = timeit(lambda: g3(*args))
    print(f"shipped-banded {h}x{w}/{iters}: {d3*1e3:.3f} ms, "
          f"{h*w*iters/d3/1e9:.2f} Gpx*sweeps/s", flush=True)
    print("DONE", flush=True)
