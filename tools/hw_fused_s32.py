"""HW: fused-solve geometry probe — forced block depths.

pick_geometry's cost model (17 ps/px + 30 us/step) keeps choosing
s=15/rem=10 at cap 16 AND cap 32; but measured 1080p time (5.52 ms) vs
the model (4.18 ms) implies the true per-step cost is ~120 us, which
would reward deeper blocking. This probes hand-built geometries through
_solve_zero_ad: s=10/20/25 with rem=0 (no remainder phase -> single
compiled sweep body) against the picker's s=15/rem=10, giving a
step-cost regression from real data. All legs assert exactness vs the
jnp oracle.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.kernels.solve_fused import _solve_zero_ad, pick_geometry
from opticalflowhs_tpu.ops import stencils


def timeit(fn, n=10):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def probe(h, w, iters, geom, n=10, oracle=None):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    tag = f"{h}x{w} i{iters} geom{geom}"
    fn = jax.jit(lambda a, b: _solve_zero_ad(a, b, 0.5, iters, "hs_cube",
                                             geom, False))
    try:
        out = fn(i1, i2); float(jnp.sum(out[0]))
    except Exception as e:
        print(f"{tag}: FAIL {str(e)[:300]}", flush=True)
        return
    if oracle is not None:
        u, v = oracle
        d = max(float(jnp.abs(out[0] - u).max()),
                float(jnp.abs(out[1] - v).max()))
        print(f"{tag}: max|fused-jnp| = {d}", flush=True)
    dt = timeit(fn, n)
    print(f"{tag}: {dt*1e3:.3f} ms, {h*w*iters/dt/1e9:.2f} Gpx*sweeps/s",
          flush=True)


def main():
    h, w, iters = 1088, 1920, 100
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    ex, ey, et = stencils.derivatives(i1, i2)
    invd = 1.0 / (0.25 + ex * ex + ey * ey)
    u = jnp.zeros_like(ex); v = jnp.zeros_like(ex)
    for _ in range(iters):
        u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
    oracle = (u, v)

    # (s, rem, sigma, band, hp): sigma = round_up(s, 8) | band, hp = nb*band
    for geom in (
        (10, 0, 16, 544, 1088),   # shallow, 20 steps — step-cost anchor
        (20, 0, 24, 552, 1104),   # 10 steps, window 600
        (25, 0, 32, 544, 1088),   # 8 steps, window 608 — VMEM edge
    ):
        probe(h, w, iters, geom, oracle=oracle)
    # picker's choice, for reference (already measured in hw_fused_ab):
    print(f"picker: {pick_geometry(h, 1920, iters, jnp.float32, 16)}",
          flush=True)
    # 4K with the winner-class depth
    probe(2176, 3840, 100, (25, 0, 32, 272, 2176), n=5)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
