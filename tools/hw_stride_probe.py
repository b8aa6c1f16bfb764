"""Which axis makes stride-2 relayouts expensive? Times row-only
(sublane) vs column-only (lane) de-interleave and re-interleave of a
(1088, 2048) fp32 array, plus the reshape-based column variants —
decides whether a row-parity-only plane SOR (2 half arrays, column
where-blends) can dodge the 159 ms packing tax."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


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


H, W = 1088, 2048
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))

legs = {
    "rows 0::2 (sublane stride)": jax.jit(lambda x: (x[0::2], x[1::2])),
    "cols 0::2 (lane stride)": jax.jit(lambda x: (x[:, 0::2], x[:, 1::2])),
    "cols via reshape": jax.jit(
        lambda x: tuple(x.reshape(H, W // 2, 2)[:, :, i] for i in (0, 1))
    ),
    "row interleave (stack+reshape)": jax.jit(
        lambda x: jnp.stack([x[0::2], x[1::2]], axis=1).reshape(H, W)
    ),
    "col interleave (stack+reshape)": jax.jit(
        lambda x: jnp.stack([x[:, 0::2], x[:, 1::2]], axis=-1).reshape(H, W)
    ),
}
for name, fn in legs.items():
    try:
        dt = timeit(lambda: fn(a))
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:150]}", flush=True)
print("DONE", flush=True)
