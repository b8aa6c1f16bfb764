"""HW: per-call dispatch floor on the axon remote-TPU tunnel.

The fused-solve A/B shows every solve carries ~2.4-3.5 ms of fixed cost
that survives whole-solve kernel fusion (i20 fused = 3.96 ms where the
model says ~1.2 ms). Hypothesis: it is the tunnel's per-jit-CALL dispatch
latency — a property of this machine's remote-TPU setup, not of the
kernels. This measures the floor directly:

 1. tiny jnp op, timed per call          -> pure dispatch floor
 2. tiny pallas kernel, timed per call   -> + custom-call overhead
 3. k back-to-back calls without sync    -> does enqueue pipeline?
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, n=50):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


x = jnp.ones((8, 128), jnp.float32)

f1 = jax.jit(lambda a: a + 1.0)
print(f"jnp tiny per-call: {timeit(lambda: f1(x))*1e3:.3f} ms", flush=True)


def _k(a_ref, o_ref):
    o_ref[...] = a_ref[...] + 1.0


pk = jax.jit(lambda a: pl.pallas_call(
    _k, out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a))
print(f"pallas tiny per-call: {timeit(lambda: pk(x))*1e3:.3f} ms", flush=True)


def chain(k):
    def run():
        y = x
        for _ in range(k):
            y = f1(y)
        return y
    return run


for k in (1, 4, 16):
    dt = timeit(chain(k), n=20)
    print(f"chain of {k} uns synced calls: {dt*1e3:.3f} ms total, "
          f"{dt/k*1e3:.3f} ms/call", flush=True)

# one jit'd region containing k adds — the no-dispatch control
for k in (16,):
    fk = jax.jit(lambda a: functools.reduce(lambda y, _: y + 1.0, range(k), a))
    print(f"single call, {k} fused adds: {timeit(lambda: fk(x))*1e3:.3f} ms",
          flush=True)
print("DONE", flush=True)
