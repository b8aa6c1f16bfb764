"""HW: full lane-stacked [u|v] sweep formulation vs the shipped kernel.

The kernels are per-op-dispatch-bound (~1-1.7us/vector-op). Stacking u,v
along lanes into one (band, 2W) array halves the number of dispatches for
the navg passes and the update; round 1 tried stacking only the navg
(wash); this tries the FULL formulation including frac/update:

  U = [u | v], EX = [ex | ey]
  Ubar = navg(U)            (seam-masked column shifts)
  P = EX * Ubar             (1 op for both products)
  frac = P[:, :W] + P[:, W:] + et) * invd      (half-width ops)
  U' = Ubar - EX * [frac | frac]

Exactness: the seam column shift would mix u/v; the right-edge mask of u's
half and left-edge mask of v's half must fire there, which they do when
masks are built per-half (gc % W).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.kernels.jacobi import _cshift, _round_up

def _stacked_kernel(ex2_ref, et_ref, invd_ref, u20_ref, uo_ref, *, n, h, w):
    EX = ex2_ref[...]
    et = et_ref[...]
    invd = invd_ref[...]
    hp, w2 = EX.shape
    gr = jax.lax.broadcasted_iota(jnp.int32, (hp, w2), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (hp, w2), 1) % w  # per-half cols
    m_top = None if True else None
    # rows: array edges are true edges (no pad rows when h==hp) -> cshift
    m_bot = None if h == hp else gr == h - 1
    m_lf = gc == 0
    m_rt = gc == w - 1
    uo_ref[...] = u20_ref[...]

    def sh(a, m, shift, axis):
        if m is None:
            return _cshift(a, shift, axis)
        r = pltpu.roll(a, shift=shift, axis=axis)
        return jnp.where(m, a, r)

    def body(_, c):
        U = uo_ref[...]
        up = _cshift(U, 1, 0)
        dn = sh(U, m_bot, hp - 1, 0)
        t = up + 2.0 * U + dn
        rt = sh(t, m_lf, 1, 1)
        lf = sh(t, m_rt, w2 - 1, 1)
        s = rt + 2.0 * t + lf
        Ubar = s * (1.0 / 12.0) - U * (1.0 / 3.0)
        P = EX * Ubar
        frac = (P[:, :w] + P[:, w:] + et) * invd
        F2 = jnp.concatenate([frac, frac], axis=1)
        uo_ref[...] = Ubar - EX * F2
        return c
    jax.lax.fori_loop(0, n, body, 0)

def stacked_sweeps(u, v, ex, ey, et, invd, n):
    h, w = u.shape
    assert w % 128 == 0 and h % 8 == 0
    EX = jnp.concatenate([ex, ey], axis=1)
    U0 = jnp.concatenate([u, v], axis=1)
    out = jax.ShapeDtypeStruct((h, 2 * w), u.dtype)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    U = pl.pallas_call(
        functools.partial(_stacked_kernel, n=n, h=h, w=w),
        out_shape=out,
        in_specs=[spec] * 4,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=108*1024*1024),
    )(EX, et, invd, U0)
    return U[:, :w], U[:, w:]

h, w, iters = 1024, 1280, 100
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
ex, ey, et = stencils.derivatives(i1, i2)
invd = 1.0/(0.25 + ex*ex + ey*ey)
u0 = jnp.zeros_like(ex); v0 = jnp.zeros_like(ex)

# exactness vs oracle
f = jax.jit(functools.partial(stacked_sweeps, n=12))
try:
    uo, vo = f(u0, v0, ex, ey, et, invd); float(jnp.sum(uo))
except Exception as e:
    print("stacked: compile FAIL", str(e)[:200], flush=True); raise SystemExit
ur, vr = u0, v0
for _ in range(12):
    ur, vr = stencils.jacobi_step(ur, vr, ex, ey, et, invd)
print("stacked vs oracle max:", float(jnp.abs(uo-ur).max()), float(jnp.abs(vo-vr).max()), flush=True)

def timeit(fn, n=10):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n

g = jax.jit(functools.partial(stacked_sweeps, n=iters))
d = timeit(lambda: g(u0, v0, ex, ey, et, invd))
print(f"stacked   1024x1280/{iters}: {d*1e3:.3f} ms, {h*w*iters/d/1e9:.2f} Gpx*sweeps/s", flush=True)

from opticalflowhs_tpu.kernels.jacobi import jacobi_sweeps
g2 = jax.jit(functools.partial(jacobi_sweeps, n_sweeps=iters))
d2 = timeit(lambda: g2(u0, v0, ex, ey, et, invd))
print(f"shipped   1024x1280/{iters}: {d2*1e3:.3f} ms, {h*w*iters/d2/1e9:.2f} Gpx*sweeps/s", flush=True)
print("DONE", flush=True)
