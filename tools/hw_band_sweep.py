"""HW: banded-kernel geometry sweep for the single-frame 1080p headline.
The batched kernel at B2+ reaches 43-49 Gpx*sweeps/s with more grid steps
to pipeline; single-frame sits at ~34.5 with nb=3. Sweep band height
(grid depth vs halo-redundancy) and block_sweeps."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import importlib
import jax, jax.numpy as jnp, numpy as np

def run(band, s, h=1088, w=1920, iters=100, n=10):
    os.environ["HSFLOW_BAND_ROWS"] = str(band)
    import opticalflowhs_tpu.kernels.jacobi as jk
    importlib.reload(jk)
    from opticalflowhs_tpu.ops import stencils
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
    @jax.jit
    def solve(a, b):
        ex, ey, et = stencils.derivatives(a, b)
        invd = 1.0/(0.25 + ex*ex + ey*ey)
        u = jnp.zeros_like(a); v = jnp.zeros_like(a)
        return jk.jacobi_sweeps(u, v, ex, ey, et, invd, iters, block_sweeps=s)
    try:
        out = solve(i1, i2); float(jnp.sum(out[0]))
    except Exception as e:
        print(f"band={band} s={s}: FAIL {str(e)[:120]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): out = solve(i1, i2)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f"band={band or 'auto'} s={s}: {dt*1e3:.3f} ms, {h*w*iters/dt/1e9:.2f} Gpx*sweeps/s", flush=True)

for band in (0, 136, 176, 272, 544):
    run(band, 16)
run(272, 8)
run(272, 24)
run(136, 24)
run(176, 16, h=2176, w=3840, iters=100, n=5)   # 4K check at a good 1080p point
print("DONE", flush=True)
