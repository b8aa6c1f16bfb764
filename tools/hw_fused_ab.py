"""HW: fused banded megakernel A/B vs the multi-launch banded path.

The multi-launch path pays ~250 us of fixed cost per s-sweep block (XLA
slab assembly + dispatch + pipeline fill); _sweeps_banded_fused runs the
whole (n_blocks, bands) schedule in ONE pallas_call with u/v ping-ponged
between two HBM buffers by block parity. Measures exactness vs the jnp
oracle and throughput at 1080p and 4K.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import importlib
import jax, jax.numpy as jnp, numpy as np


def bench(fused, h, w, iters=100, s=16, n=10, check=False):
    os.environ["HSFLOW_FUSED_BANDED"] = "1" if fused else "0"
    import opticalflowhs_tpu.kernels.jacobi as jk
    importlib.reload(jk)
    from opticalflowhs_tpu.ops import stencils
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

    tag = f"{'fused' if fused else 'multi'} {h}x{w} i{iters} s{s}"
    try:
        out = solve(i1, i2)
        float(jnp.sum(out[0]))  # force remote compile + readback
    except Exception as e:
        print(f"{tag}: FAIL {str(e)[:200]}", flush=True)
        return None
    if check:
        @jax.jit
        def oracle(a, b):
            ex, ey, et = stencils.derivatives(a, b)
            invd = 1.0 / (0.25 + ex * ex + ey * ey)
            u = jnp.zeros_like(a)
            v = jnp.zeros_like(a)
            for _ in range(iters):
                u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
            return u, v
        ref = oracle(i1, i2)
        float(jnp.sum(ref[0]))
        d = max(float(jnp.max(jnp.abs(out[0] - ref[0]))),
                float(jnp.max(jnp.abs(out[1] - ref[1]))))
        print(f"{tag}: max|pallas-jnp| = {d}", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = solve(i1, i2)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    gps = h * w * iters / dt / 1e9
    print(f"{tag}: {dt*1e3:.3f} ms, {gps:.2f} Gpx*sweeps/s", flush=True)
    return gps


bench(True, 1088, 1920, check=True)   # exactness + perf, fused
bench(False, 1088, 1920)              # multi-launch baseline, same process
bench(True, 2176, 3840, n=5)          # 4K fused
bench(False, 2176, 3840, n=5)         # 4K multi-launch
bench(True, 1088, 1920, iters=20, s=10, check=True)   # low-iteration video preset
print("DONE", flush=True)
