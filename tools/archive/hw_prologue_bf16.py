"""HW: (a) derivative-prologue cost at low iteration counts (VERDICT item
10 — fuse or document <3%); (b) bf16 round 2 (VERDICT item 8): does a
packed-u32 lane roll dodge the Mosaic bf16-roll gap, and what does a full
bf16 sweep buy?"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve, precompute
from opticalflowhs_tpu.kernels.jacobi import jacobi_sweeps

def timeit(fn, n=20):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n

# ---------- (a) prologue cost ----------
h, w = 1088, 1920
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
for iters in (20, 100):
    cfg = HSConfig(alpha=0.5, iters=iters, backend="pallas")
    d_full = timeit(lambda: hs_solve(i1, i2, cfg))
    # sweeps only (fields precomputed outside the timed region)
    cfgj = HSConfig(alpha=0.5, iters=iters, backend="pallas")
    ex, ey, et, invd = jax.jit(lambda a, b: precompute(a, b, cfgj))(i1, i2)
    u0 = jnp.zeros_like(ex); v0 = jnp.zeros_like(ex)
    f = jax.jit(functools.partial(jacobi_sweeps, n_sweeps=iters))
    d_sweeps = timeit(lambda: f(u0, v0, ex, ey, et, invd))
    print(f"iters={iters}: full {d_full*1e3:.3f} ms, sweeps-only {d_sweeps*1e3:.3f} ms, "
          f"prologue {100*(d_full-d_sweeps)/d_full:.1f}%", flush=True)

# ---------- (b) bf16: can a packed-u32 roll shift bf16 lanes? ----------
def packed_roll_right(a):
    """out[:, j] = a[:, j-1] (periodic) for bf16 via one u32 roll + shifts."""
    hh, ww = a.shape
    L = jax.lax.bitcast_convert_type(a.reshape(hh, ww // 2, 2), jnp.uint32)
    Lm1 = pltpu.roll(L, shift=1, axis=1)
    out = (L << 16) | (Lm1 >> 16)
    return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(hh, ww)

def packed_roll_left(a):
    hh, ww = a.shape
    L = jax.lax.bitcast_convert_type(a.reshape(hh, ww // 2, 2), jnp.uint32)
    Lp1 = pltpu.roll(L, shift=L.shape[1]-1, axis=1)
    out = (L >> 16) | (Lp1 << 16)
    return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(hh, ww)

def _probe_kernel(x_ref, o_ref, *, mode):
    x = x_ref[...]
    if mode == "packed_right":
        o_ref[...] = packed_roll_right(x)
    elif mode == "packed_left":
        o_ref[...] = packed_roll_left(x)
    elif mode == "sublane_roll":
        o_ref[...] = pltpu.roll(x, shift=1, axis=0)
    elif mode == "lane_roll":
        o_ref[...] = pltpu.roll(x, shift=1, axis=1)

def probe(mode, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.uniform(0,1,(256,256))).astype(dtype)
    try:
        out = pl.pallas_call(
            functools.partial(_probe_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        )(x)
        ref = np.roll(np.asarray(x, np.float32), 1, axis=(0 if mode=="sublane_roll" else 1))
        got = np.asarray(out, np.float32)
        ok = np.allclose(got, ref)
        print(f"bf16 {mode}: compiled, correct={ok}", flush=True)
        return ok
    except Exception as e:
        print(f"bf16 {mode}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return False

probe("lane_roll")
probe("sublane_roll")
probe("packed_right")
probe("packed_left")

# bf16 full solve throughput as currently shipped (concat shifts)
cfg16 = HSConfig(alpha=0.5, iters=100, backend="pallas", dtype="bfloat16")
d16 = timeit(lambda: hs_solve(i1, i2, cfg16), n=10)
cfg32 = HSConfig(alpha=0.5, iters=100, backend="pallas")
d32 = timeit(lambda: hs_solve(i1, i2, cfg32), n=10)
print(f"1080p/100: bf16 {h*w*100/d16/1e9:.2f} vs fp32 {h*w*100/d32/1e9:.2f} Gpx*sweeps/s", flush=True)
print("DONE", flush=True)
