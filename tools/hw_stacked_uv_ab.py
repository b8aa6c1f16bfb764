"""HW: stacked-u/v sweep kernel A/B (the 'fewer ops' lever, retested under
ref-state loops — docs/PERFORMANCE.md 'next levers').

Hypothesis: the sweep loop is per-op-dispatch-bound, so stacking u and v
along rows into one (2H, W) array — one _navg pass for both fields, per-
image clamping exactly like the batched stacked kernel — trades ~10% more
element work for ~1.6x fewer Mosaic ops per sweep. The earlier attempt
measured slightly worse under fori_loop CARRIES; loop state now lives in
output refs (the 40% carry penalty is gone), so the dispatch saving may
now be visible.

Measures the whole-image VMEM path at 512x640 (fits VMEM) at i100/i400 to
extract the marginal per-sweep cost; asserts the stacked kernel is
BITWISE-equal to the current kernel (same _navg, same association order).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflowhs_tpu.kernels.jacobi import (
    _VMEM_BUDGET, _edge_masks, _navg, _round_up, _sweeps_vmem, pad_to_tiles,
)
from opticalflowhs_tpu.ops import stencils


def _stacked_kernel(exey_ref, et_ref, invd_ref, w0_ref, wo_ref, *,
                    n_sweeps: int, h: int, w: int):
    """One ref-state loop over a row-stacked state wo = [u; v] (2hp, wp).

    Per sweep: ONE _navg over the stack (4 shifts for both fields instead
    of 8), then the coupled update via a stacked ex/ey product, two half
    slices, and a duplicated frac. Arithmetic per pixel is identical to
    _kernel_step (same order), so the result is bitwise-equal.
    """
    exey = exey_ref[...]                     # (2hp, wp): [ex; ey]
    et, invd = et_ref[...], invd_ref[...]    # (hp, wp)
    hp, wp = et.shape
    gr = jax.lax.broadcasted_iota(jnp.int32, (2 * hp, wp), 0) % hp
    gc = jax.lax.broadcasted_iota(jnp.int32, (2 * hp, wp), 1)
    masks = _edge_masks(gr, gc, h, w, (False, False, True, w == wp))
    wo_ref[...] = w0_ref[...]

    def body(_, x):
        uv = wo_ref[...]
        bar = _navg(uv, masks)               # [ubar; vbar]
        p = exey * bar                       # [ex*ubar; ey*vbar]
        num = p[:hp] + p[hp:] + et
        frac = num * invd
        fr2 = jnp.concatenate([frac, frac], axis=0)
        wo_ref[...] = bar - exey * fr2
        return x

    jax.lax.fori_loop(0, n_sweeps, body, 0)


def sweeps_stacked(u, v, ex, ey, et, invd, n_sweeps, h, w, interpret=False):
    exey = jnp.concatenate([ex, ey], axis=0)
    w0 = jnp.concatenate([u, v], axis=0)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stacked_kernel, n_sweeps=n_sweeps, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct(w0.shape, w0.dtype),
        in_specs=[spec] * 4,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024
        ),
        interpret=interpret,
    )(exey, et, invd, w0)
    hp = ex.shape[0]
    return out[:hp], out[hp:]


def timeit(fn, n=20):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def run(h, w, iters, n=20):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    ex, ey, et = stencils.derivatives(i1, i2)
    invd = 1.0 / (0.25 + ex * ex + ey * ey)
    hp, wp = _round_up(h, 8), _round_up(w, 128)
    ex, ey, et, invd = (pad_to_tiles(a, hp, wp) for a in (ex, ey, et, invd))
    u = jnp.zeros_like(ex)
    v = jnp.zeros_like(ex)

    cur = jax.jit(lambda: _sweeps_vmem(u, v, ex, ey, et, invd, iters, h, w,
                                       False))
    stk = jax.jit(lambda: sweeps_stacked(u, v, ex, ey, et, invd, iters, h, w))

    uc, vc = cur(); float(jnp.sum(uc))
    try:
        us, vs = stk(); float(jnp.sum(us))
    except Exception as e:
        print(f"stacked {h}x{w} i{iters}: FAIL {str(e)[:300]}", flush=True)
        return
    d = max(float(jnp.abs(us - uc).max()), float(jnp.abs(vs - vc).max()))
    print(f"{h}x{w} i{iters}: max|stacked-current| = {d}", flush=True)

    tc = timeit(cur, n)
    ts = timeit(stk, n)
    gx = h * w * iters / 1e9
    print(f"current {h}x{w} i{iters}: {tc*1e3:.3f} ms, {gx/tc:.2f} Gpx*sw/s",
          flush=True)
    print(f"stacked {h}x{w} i{iters}: {ts*1e3:.3f} ms, {gx/ts:.2f} Gpx*sw/s",
          flush=True)


if __name__ == "__main__":
    run(512, 640, 100)
    run(512, 640, 400)
    print("DONE", flush=True)
