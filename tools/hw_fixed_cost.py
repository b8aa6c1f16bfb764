"""HW: decompose the 1080p solve into fixed per-solve cost + per-block cost.

RESULTS_HW round-2 regen shows 1080p i100 at 35.5 Gpx*sweeps/s vs 4K at
48.5 — yet both run the SAME ~1.1 Mpx windows in the fused megakernel
(576x1920 vs 304x3840), and the window-shape control bounded the shape
advantage at ~8%. Hypothesis: a per-SOLVE fixed cost (tunnel dispatch,
derivative prologue, slab assembly, and the remainder launch for
100 % 16 = 4 sweeps) dominates the gap; 4K amortizes it over 3.5x the
pixels.

Probes (one process, shared warmup):
  1. hs_solve 1080p at iters 16/32/64/96 with s=16 -> linear fit
     t = a + b*blocks gives the fixed cost a directly.
  2. i100 with s in {16 (rem 4), 20 (rem 0), 25 (rem 0)}: does killing
     the remainder launch pay more than the bigger halos cost?
  3. bare jacobi_sweeps i100 (fields precomputed) vs full hs_solve i100:
     isolates the derivative-prologue + assembly share of the fixed cost.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.kernels.jacobi import jacobi_sweeps

H, W = 1088, 1920
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))


def timeit(fn, n=10):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# 1. iters scaling at s=16
rows = []
for iters in (16, 32, 64, 96):
    cfg = HSConfig(alpha=0.5, iters=iters, backend="pallas", block_sweeps=16)
    d = timeit(lambda c=cfg: hs_solve(i1, i2, c))
    rows.append((iters, d))
    print(f"hs_solve 1080p i{iters} s16: {d*1e3:.3f} ms "
          f"({H*W*iters/d/1e9:.2f} Gpx*sweeps/s)", flush=True)
# least-squares t = a + b*blocks
bl = np.array([r[0] / 16 for r in rows])
ts = np.array([r[1] for r in rows])
A = np.vstack([np.ones_like(bl), bl]).T
(a, b), *_ = np.linalg.lstsq(A, ts, rcond=None)
print(f"fit: fixed = {a*1e3:.3f} ms/solve, per-block = {b*1e3:.3f} ms "
      f"(per-sweep {b/16*1e6:.1f} us)", flush=True)

# 2. remainder-free block sizes at i100
for s in (16, 20, 25):
    cfg = HSConfig(alpha=0.5, iters=100, backend="pallas", block_sweeps=s)
    d = timeit(lambda c=cfg: hs_solve(i1, i2, c))
    print(f"hs_solve 1080p i100 s{s}: {d*1e3:.3f} ms "
          f"({H*W*100/d/1e9:.2f} Gpx*sweeps/s)", flush=True)

# 3. bare sweeps (no prologue, zeros init)
ex, ey, et = stencils.derivatives(i1, i2)
invd = 1.0 / (0.25 + ex * ex + ey * ey)
u0 = jnp.zeros_like(ex); v0 = jnp.zeros_like(ex)
for s in (16, 20):
    g = jax.jit(functools.partial(jacobi_sweeps, n_sweeps=100, block_sweeps=s))
    d = timeit(lambda: g(u0, v0, ex, ey, et, invd))
    print(f"bare sweeps 1080p i100 s{s}: {d*1e3:.3f} ms "
          f"({H*W*100/d/1e9:.2f} Gpx*sweeps/s)", flush=True)
print("DONE", flush=True)
