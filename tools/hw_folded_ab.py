"""HW: lane-folded banded path A/B vs the unfolded banded path.

tools/hw_shape_probe.py measured a 1.53x same-process win for 544x3840
windows over 576x1920 at equal pixels; the folded path packs k row
segments of one frame side-by-side along lanes (fold halos refreshed per
sweep block) to buy that window shape for narrow frames like 1080p.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import importlib
import jax, jax.numpy as jnp, numpy as np


def bench(fold_lanes, h, w, iters=100, s=16, n=10, check=False, tag2=""):
    os.environ["HSFLOW_FOLD_LANES"] = str(fold_lanes)
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

    tag = f"{'fold' + str(fold_lanes) if fold_lanes else 'plain'} {h}x{w} i{iters} s{s}{tag2}"
    try:
        out = solve(i1, i2)
        float(jnp.sum(out[0]))  # force remote compile + readback
    except Exception as e:
        print(f"{tag}: FAIL {str(e)[:300]}", flush=True)
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


bench(3840, 1088, 1920, check=True)     # folded 1080p (k=2): exactness + perf
bench(0, 1088, 1920)                    # unfolded same-process baseline
bench(7680, 1088, 1920)                 # k=4 probe (hs=272, windows ~300x7680)
bench(3840, 1088, 1920, iters=20, s=10, check=True)  # video preset, folded
bench(0, 1088, 1920, iters=20, s=10)                 # video preset, unfolded
print("DONE", flush=True)
