"""HW: whole-solve fused pipeline (kernels/solve_fused.py) A/B vs classic.

Measures hs_solve end-to-end (the driver headline path) with
HSFLOW_FUSED_SOLVE on/off in one process: exactness vs the jnp oracle,
then throughput at 1080p and 4K, i100 and the i20 video preset.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.kernels.solve_fused import hs_solve_fused, pick_geometry
from opticalflowhs_tpu.kernels.jacobi import jacobi_sweeps
from opticalflowhs_tpu.kernels.derivatives import derivatives_precompute


S_CAP = int(os.environ.get("ABCAP", "16"))


def timeit(fn, n=10):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def frames(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)))


def classic(i1, i2, alpha, iters):
    ex, ey, et, invd = derivatives_precompute(i1, i2, alpha, "hs_cube")
    u = jnp.zeros_like(ex)
    v = jnp.zeros_like(ex)
    return jacobi_sweeps(u, v, ex, ey, et, invd, iters)


def bench(h, w, iters, n=10, check=False):
    i1, i2 = frames(h, w)
    geom = pick_geometry(h, ((w + 127) // 128) * 128, iters, jnp.float32, S_CAP)
    print(f"--- {h}x{w} i{iters}: geometry {geom}", flush=True)
    if geom is None:
        return

    fused = jax.jit(lambda a, b: hs_solve_fused(a, b, 0.5, iters, s_cap=S_CAP))
    cla = jax.jit(lambda a, b: classic(a, b, 0.5, iters))
    try:
        out = fused(i1, i2); float(jnp.sum(out[0]))
    except Exception as e:
        print(f"fused {h}x{w} i{iters}: FAIL {str(e)[:300]}", flush=True)
        return
    if check:
        ex, ey, et = stencils.derivatives(i1, i2)
        invd = 1.0 / (0.25 + ex * ex + ey * ey)
        u = jnp.zeros_like(ex); v = jnp.zeros_like(ex)
        for _ in range(iters):
            u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
        d = max(float(jnp.abs(out[0] - u).max()), float(jnp.abs(out[1] - v).max()))
        print(f"fused {h}x{w} i{iters}: max|fused-jnp| = {d}", flush=True)
    dt = timeit(lambda: fused(i1, i2), n)
    print(f"fused   {h}x{w} i{iters}: {dt*1e3:.3f} ms, "
          f"{h*w*iters/dt/1e9:.2f} Gpx*sweeps/s", flush=True)
    dt2 = timeit(lambda: cla(i1, i2), n)
    print(f"classic {h}x{w} i{iters}: {dt2*1e3:.3f} ms, "
          f"{h*w*iters/dt2/1e9:.2f} Gpx*sweeps/s", flush=True)


def bench_batched(b, h, w, iters, n=5):
    from opticalflowhs_tpu.kernels.solve_fused import hs_solve_fused_batched

    rng = np.random.default_rng(1)
    i1 = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    fn = jax.jit(lambda a, c: hs_solve_fused_batched(a, c, 0.5, iters,
                                                     s_cap=S_CAP))
    try:
        out = fn(i1, i2); float(jnp.sum(out[0]))
    except Exception as e:
        print(f"fused-b B{b}x{h}x{w} i{iters}: FAIL {str(e)[:300]}", flush=True)
        return
    # exactness of lane 0 vs oracle
    ex, ey, et = stencils.derivatives(i1[0], i2[0])
    invd = 1.0 / (0.25 + ex * ex + ey * ey)
    u = jnp.zeros_like(ex); v = jnp.zeros_like(ex)
    for _ in range(iters):
        u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
    d = float(jnp.abs(out[0][0] - u).max())
    print(f"fused-b B{b}x{h}x{w} i{iters}: max|fused-jnp| = {d}", flush=True)
    dt = timeit(lambda: fn(i1, i2), n)
    print(f"fused-b B{b}x{h}x{w} i{iters}: {dt*1e3:.3f} ms, "
          f"{b*h*w*iters/dt/1e9:.2f} Gpx*sweeps/s", flush=True)


def check_warm(h, w, iters=30):
    i1, i2 = frames(h, w, seed=2)
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))
    fn = jax.jit(lambda a, c, u, v: hs_solve_fused(a, c, 0.5, iters,
                                                   s_cap=S_CAP, u0=u, v0=v))
    try:
        out = fn(i1, i2, u0, v0); float(jnp.sum(out[0]))
    except Exception as e:
        print(f"warm {h}x{w}: FAIL {str(e)[:300]}", flush=True)
        return
    ex, ey, et = stencils.derivatives(i1, i2)
    invd = 1.0 / (0.25 + ex * ex + ey * ey)
    u, v = u0, v0
    for _ in range(iters):
        u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
    d = max(float(jnp.abs(out[0] - u).max()), float(jnp.abs(out[1] - v).max()))
    print(f"warm {h}x{w} i{iters}: max|fused-jnp| = {d}", flush=True)


bench(1088, 1920, 100, check=True)
bench(2176, 3840, 100, n=5, check=True)
bench(1088, 1920, 20)
bench_batched(2, 1088, 1920, 100)
check_warm(1088, 1920)
bench(4352, 7680, 50, n=5)
print("DONE", flush=True)
