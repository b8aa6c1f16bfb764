"""Split the plane-SOR kernel's 159 ms/i50 into fixed (XLA plane packing —
24 lane-stride-2 relayouts) vs marginal (in-kernel per-sweep) cost:
i1 vs i10 vs i50 timings, plus a standalone packing probe (de-interleave
4 fields + re-interleave 2, jitted alone)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

import opticalflowhs_tpu.kernels.sor_planes as sp


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=20):
    out = fn()
    sync(out)
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


H, W = 1088, 1920
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

# standalone packing probe
hp, wp = sp.applicable_shape(H, W, jnp.float32)
from opticalflowhs_tpu.kernels.jacobi import pad_to_tiles


@jax.jit
def pack_probe(a, b, c, d):
    outs = []
    for f in (a, b, c, d):
        outs.extend(sp._planes(pad_to_tiles(f, hp, wp)))
    return outs


@jax.jit
def unpack_probe(p00, p01, p10, p11):
    return sp._interleave(p00, p01, p10, p11)


dt = timeit(lambda: pack_probe(i1, i2, i1, i2))
print(f"pack 4 fields -> 16 planes: {dt*1e3:.3f} ms", flush=True)
pl = pack_probe(i1, i2, i1, i2)
dt = timeit(lambda: unpack_probe(*pl[:4]))
print(f"unpack 4 planes -> 1 field: {dt*1e3:.3f} ms", flush=True)

for IT in (1, 10):
    @jax.jit
    def run(a, b, n=IT):
        return sp.hs_solve_sor_planes(a, b, 0.5, n, 1.71)

    dt = timeit(lambda: run(i1, i2))
    print(f"plane solve i{IT}: {dt*1e3:.3f} ms", flush=True)
print("DONE", flush=True)
