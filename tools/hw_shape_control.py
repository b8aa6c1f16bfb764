"""HW control: does the window-shape advantage survive the solve context?

hw_shape_probe.py (raw jacobi_sweeps calls) measured 544x3840 1.53x faster
than 1088x1920 at equal pixels, but the folded path (which buys that shape)
LOST 10% vs plain in the solve context. This control times hs_solve-style
jits on real 544x3840 vs 1088x1920 images in ONE process to separate the
shape effect from process variance and calling convention.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HSFLOW_FOLD_LANES"] = "0"
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.kernels import jacobi as jk
from opticalflowhs_tpu.ops import stencils


def solve_time(h, w, iters=100, s=16, n=10):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))

    @jax.jit
    def solve(a, b):
        ex, ey, et = stencils.derivatives(a, b)
        invd = 1.0 / (0.25 + ex * ex + ey * ey)
        u = jnp.zeros_like(a)
        v = jnp.zeros_like(a)
        return jk.jacobi_sweeps(u, v, ex, ey, et, invd, iters, block_sweeps=s)

    try:
        out = solve(i1, i2)
        float(jnp.sum(out[0]))
    except Exception as e:
        print(f"{h}x{w}: FAIL {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        out = solve(i1, i2)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{h}x{w}: {dt*1e3:.3f} ms, {h*w*iters/dt/1e9:.2f} Gpx*sweeps/s",
          flush=True)


solve_time(544, 3840)    # the folded target shape, as a REAL image
solve_time(1088, 1920)   # 1080p, same process
solve_time(544, 3840)    # repeat to expose warm drift
print("DONE", flush=True)
