"""Microbenchmark of Jacobi-sweep kernel formulations on TPU.

Explores the lane-shift strategy space (SURVEY.md §7 "Sublane-dim shifts"):
concat-slice shifts vs pltpu.roll vs separable [1,2,1] vs MXU tridiagonal
matmul for the lane (column) pass. Informs kernels/jacobi.py.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1024, 1280
SWEEPS = 20
ALPHA = 0.5


def make_inputs():
    rng = np.random.default_rng(0)
    arrs = [jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)) for _ in range(6)]
    return arrs  # u, v, ex, ey, et, invd


# -- shift helpers on values ---------------------------------------------------

def sl_concat(a):  # a(i, j+1) clamp
    return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

def sr_concat(a):
    return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

def su_concat(a):  # a(i+1, j)
    return jnp.concatenate([a[1:, :], a[-1:, :]], axis=0)

def sd_concat(a):
    return jnp.concatenate([a[:1, :], a[:-1, :]], axis=0)


def navg_concat(u):
    up, dn, lf, rt = sd_concat(u), su_concat(u), sr_concat(u), sl_concat(u)
    return (up + dn + lf + rt) / 6.0 + (
        sr_concat(up) + sl_concat(up) + sr_concat(dn) + sl_concat(dn)
    ) / 12.0


def navg_sep_concat(u):
    t = sd_concat(u) + 2.0 * u + su_concat(u)
    s = sr_concat(t) + 2.0 * t + sl_concat(t)
    return s * (1.0 / 12.0) - u * (1.0 / 3.0)


def _col_ids():
    return jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)


def navg_sep_roll(u, cols):
    t = sd_concat(u) + 2.0 * u + su_concat(u)
    lf = pltpu.roll(t, shift=W - 1, axis=1)  # a(i, j+1) circular
    rt = pltpu.roll(t, shift=1, axis=1)      # a(i, j-1) circular
    lf = jnp.where(cols == W - 1, t, lf)
    rt = jnp.where(cols == 0, t, rt)
    s = lf + 2.0 * t + rt
    return s * (1.0 / 12.0) - u * (1.0 / 3.0)


def make_tridiag():
    t = np.zeros((128, 128), np.float32)
    for j in range(128):
        t[j, j] = 2.0
        if j > 0:
            t[j - 1, j] = 1.0
        if j < 127:
            t[j + 1, j] = 1.0
    return jnp.asarray(t)


def navg_sep_mxu(u, tmat):
    t = sd_concat(u) + 2.0 * u + su_concat(u)
    nw = W // 128
    t3 = t.reshape(H, nw, 128)
    s3 = jax.lax.dot_general(
        t3, tmat, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s3.reshape(H, W)
    # cross-block boundary contributions + clamp at global edges
    for k in range(nw):
        j0 = k * 128
        if k > 0:
            s = s.at[:, j0].add(t[:, j0 - 1])
        else:
            s = s.at[:, 0].add(t[:, 0])
        j1 = j0 + 127
        if k < nw - 1:
            s = s.at[:, j1].add(t[:, j1 + 1])
        else:
            s = s.at[:, j1].add(t[:, j1])
    return s * (1.0 / 12.0) - u * (1.0 / 3.0)


# -- kernels -------------------------------------------------------------------

def make_kernel(navg, needs_cols=False, needs_tmat=False):
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref):
        ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
        extra = ()
        if needs_cols:
            extra = (_col_ids(),)
        if needs_tmat:
            extra = (make_tridiag(),)

        def body(_, uv):
            u, v = uv
            ub = navg(u, *extra)
            vb = navg(v, *extra)
            frac = (ex * ub + ey * vb + et) * invd
            return (ub - ex * frac, vb - ey * frac)

        u, v = jax.lax.fori_loop(0, SWEEPS, body, (u0_ref[...], v0_ref[...]))
        uo_ref[...] = u
        vo_ref[...] = v

    return kernel


def run(name, kernel):
    u, v, ex, ey, et, invd = make_inputs()
    out = jax.ShapeDtypeStruct((H, W), jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kernel,
            out_shape=(out, out),
            in_specs=[spec] * 6,
            out_specs=(spec, spec),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        )(*a)
    )
    try:
        t0 = time.perf_counter()
        r = f(ex, ey, et, invd, u, v)
        checksum = float(jnp.sum(r[0]))  # forces compile+exec
        tc = time.perf_counter() - t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        r = f(ex, ey, et, invd, u, v)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / N
    gps = H * W * SWEEPS / dt / 1e9
    print(f"{name}: {dt * 1e3:.3f} ms ({gps:.1f} Gpx*sweep/s) compile {tc:.0f}s sum={checksum:.3f}", flush=True)
    return r


def main():
    r0 = run("concat      ", make_kernel(lambda u: navg_concat(u)))
    variants = [
        ("sep-concat  ", make_kernel(lambda u: navg_sep_concat(u))),
        ("sep-roll    ", make_kernel(navg_sep_roll, needs_cols=True)),
        ("sep-mxu     ", make_kernel(navg_sep_mxu, needs_tmat=True)),
    ]
    for name, k in variants:
        r = run(name, k)
        if r is not None and r0 is not None:
            d = float(jnp.max(jnp.abs(r[0] - r0[0])))
            print(f"   max|diff| vs concat: {d:.2e}")


if __name__ == "__main__":
    main()
