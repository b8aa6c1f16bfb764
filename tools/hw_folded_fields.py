"""HW A/B (round-5 VERDICT item 3): attack the 25-instr/px sweep numerator.

Lever 1: fold inv_den into the fields at derivative time. Store
(ex, ey, exd=ex*ivd, eyd=ey*ivd, etd=et*ivd) — 5 resident fields instead
of 4 — so the update stage shrinks from
    frac = (ex*ubar + ey*vbar + et) * ivd   [mul, fma, add, mul]
    u = ubar - ex*frac; v = vbar - ey*frac  [2 fma]            = 6 ops
to
    frac = exd*ubar + eyd*vbar + etd        [mul, fma, add]
    u = ubar - ex*frac; v = vbar - ey*frac  [2 fma]            = 5 ops
i.e. 26 -> 25 ops/sweep (the two navgs are 20 of them) at the cost of one
extra resident field and one extra band read per sweep.

The probe is a standalone zero-init fixed-count kernel that reuses the
resident schedule's structure (nb bands, in-kernel derivatives, output-ref
ping-pong) minus AD/routing; the baseline leg is the production
hs_solve_resident on the same frames. If the folded variant wins >= 5%,
promote it into kernels/solve_resident.py; else this file is the measured
dead-end record (same standard as MXU resampling / lane-stacking).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import opticalflowhs_tpu.kernels.solve_resident as sr
from opticalflowhs_tpu.kernels.jacobi import _sublane, pad_to_tiles
from opticalflowhs_tpu.kernels.solve_resident import _navg_win

OUT = "/tmp/hw_folded_fields.json"
results = {}


def save():
    json.dump(results, open(OUT, "w"), indent=1)


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=30):
    out = fn()
    sync(out)
    fn()  # absorb the post-idle wake-up spike
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def _folded_kernel(i1_hbm, i2_hbm, ua_ref, va_ref, ub_ref, vb_ref,
                   ex_s, ey_s, exd_s, eyd_s, etd_s, w1_ref, w2_ref, sem, *,
                   nb, band, hp, wp, h, w, sub, n_sweeps, alpha2):
    gc = jax.lax.broadcasted_iota(jnp.int32, (band, wp), 1)
    m_rt = None if w == wp else gc == w - 1
    last_r0 = (nb - 1) * band
    if h == hp:
        m_bot_last = None
    else:
        gr = last_r0 + jax.lax.broadcasted_iota(jnp.int32, (band, wp), 0)
        m_bot_last = gr == h - 1

    def lc(a):
        if m_rt is None:
            return jnp.concatenate([a[:, 1:], a[:, wp - 1:]], axis=1)
        return jnp.where(m_rt, a,
                         jnp.concatenate([a[:, 1:], a[:, wp - 1:]], axis=1))

    def deriv_band(b):
        r0 = b * band
        last = b == nb - 1
        rows = band if last else band + 1
        rows_dma = min(-(-rows // sub) * sub, hp - r0)
        for src, dst in ((i1_hbm, w1_ref), (i2_hbm, w2_ref)):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(r0, rows_dma)], dst.at[pl.ds(0, rows_dma)], sem
            )
            cp.start()
            cp.wait()

        def up(a, awin):
            if awin is not None:
                return awin[1: band + 1]
            sh = jnp.concatenate([a[1:band], a[band - 1: band]], axis=0)
            if m_bot_last is not None:
                return jnp.where(m_bot_last, a, sh)
            return sh

        f1 = w1_ref[0:band]
        f2 = w2_ref[0:band]
        f1w = None if last else w1_ref[0: band + 1]
        f2w = None if last else w2_ref[0: band + 1]
        ex = jnp.zeros_like(f1)
        ey = jnp.zeros_like(f1)
        for f, fw in ((f1, f1w), (f2, f2w)):
            fr = up(f, fw)
            fc = lc(f)
            frc = lc(fr)
            ex = ex + (fc - f) + (frc - fr)
            ey = ey + (fr - f) + (frc - fc)
        ex = ex * 0.25
        ey = ey * 0.25
        d = f2 - f1
        dr = up(d, None if last else f2w - f1w)
        et = 0.25 * (d + dr + lc(d) + lc(dr))
        invd = 1.0 / (alpha2 + ex * ex + ey * ey)
        sl = pl.ds(r0, band)
        ex_s[sl] = ex
        ey_s[sl] = ey
        exd_s[sl] = ex * invd
        eyd_s[sl] = ey * invd
        etd_s[sl] = et * invd

    for b in range(nb):
        deriv_band(b)

    sigma = 0 if nb == 1 else sub

    def block(src_u, src_v, dst_u, dst_v, shortcut):
        for b in range(nb):
            r0 = b * band
            lo = sigma if b > 0 else 0
            hi = sigma if b < nb - 1 else 0
            w0 = r0 - lo
            win = band + lo + hi
            slw = pl.ds(w0, win)
            exw = ex_s[slw]
            eyw = ey_s[slw]
            exdw = exd_s[slw]
            eydw = eyd_s[slw]
            etdw = etd_s[slw]
            top_edge = b == 0
            bot_edge = b == nb - 1
            if bot_edge and h != hp:
                grw = w0 + jax.lax.broadcasted_iota(jnp.int32, (win, wp), 0)
                m_bot = grw == h - 1
            else:
                m_bot = None
            if m_rt is None:
                m_rtw = None
            else:
                gcw = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 1)
                m_rtw = gcw == w - 1
            if shortcut:
                u = 0.0 - exw * etdw
                v = 0.0 - eyw * etdw
            else:
                u = src_u[slw]
                v = src_v[slw]
                ubar = _navg_win(u, top_edge, bot_edge, m_bot, m_rtw)
                vbar = _navg_win(v, top_edge, bot_edge, m_bot, m_rtw)
                frac = exdw * ubar + eydw * vbar + etdw
                u = ubar - exw * frac
                v = vbar - eyw * frac
            slb = pl.ds(r0, band)
            dst_u[slb] = u[lo: lo + band]
            dst_v[slb] = v[lo: lo + band]

    t1 = (ua_ref, va_ref)
    t2 = (ub_ref, vb_ref)
    block(None, None, t1[0], t1[1], True)

    def pair(_, x):
        block(t1[0], t1[1], t2[0], t2[1], False)
        block(t2[0], t2[1], t1[0], t1[1], False)
        return x

    pairs = (n_sweeps - 1) // 2
    if pairs:
        jax.lax.fori_loop(0, pairs, pair, 0)
    if (n_sweeps - 1) % 2:
        block(t1[0], t1[1], t2[0], t2[1], False)


def folded_solve(i1, i2, alpha, n_sweeps, nb):
    h, w = i1.shape
    sub = _sublane(i1.dtype)
    units = -(-(-(-h // sub)) // nb)
    band = units * sub
    hp = band * nb
    wp = -(-w // 128) * 128
    f1 = pad_to_tiles(i1, hp, wp)
    f2 = pad_to_tiles(i2, hp, wp)
    out = jax.ShapeDtypeStruct((hp, wp), i1.dtype)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ua, va, ub, vb = pl.pallas_call(
        functools.partial(_folded_kernel, nb=nb, band=band, hp=hp, wp=wp,
                          h=h, w=w, sub=sub, n_sweeps=n_sweeps,
                          alpha2=float(alpha) ** 2),
        out_shape=(out,) * 4,
        in_specs=[any_spec] * 2,
        out_specs=(vmem,) * 4,
        scratch_shapes=[pltpu.VMEM((hp, wp), i1.dtype)] * 5
        + [pltpu.VMEM((band + sub, wp), i1.dtype)] * 2
        + [pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(f1, f2)
    u, v = (ua, va) if n_sweeps % 2 == 1 else (ub, vb)
    return u[:h, :w], v[:h, :w]


if __name__ == "__main__":
    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    NB = sr.pick_geometry(H, W, jnp.float32)[0]
    print(f"nb = {NB}", flush=True)

    for iters in (100, 20):
        @jax.jit
        def run_folded(a, b, n=iters):
            return folded_solve(a, b, 0.5, n, NB)

        @jax.jit
        def run_base(a, b, n=iters):
            return sr.hs_solve_resident(a, b, 0.5, n)

        for name, fn in (("baseline", run_base), ("folded", run_folded)):
            dt = timeit(lambda: fn(i1, i2))
            gps = H * W * iters / dt / 1e9
            print(f"1080p i{iters} {name}: {dt*1e3:.3f} ms = {gps:.2f} "
                  f"Gpx*sweeps/s", flush=True)
            results[f"i{iters}_{name}_ms"] = dt * 1e3
            save()
        d = jnp.abs(run_folded(i1, i2)[0] - run_base(i1, i2)[0]).max()
        print(f"i{iters} folded vs baseline max|du| = {float(d)} "
              f"(float-assoc slack expected, NOT bitwise)", flush=True)
        results[f"i{iters}_maxdiff"] = float(d)
        save()
    print("DONE", flush=True)
