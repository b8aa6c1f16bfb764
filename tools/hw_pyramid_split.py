"""HW: where does the 3-level 1080p pyramid's time go? (round 4)

With every level solve on the resident kernel (8.39 ms total, solves
~3.5 ms by the standalone numbers), the residual must be warp + flow
upsample + frame downsample. Times each stage standalone with the n=50
steady-state chain. Writes /tmp/hw_pyramid_split.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.pyramid import (
    downsample2x,
    upsample_flow,
    warp_bilinear_tiled,
)
from opticalflowhs_tpu.solver import Flow

OUT = "/tmp/hw_pyramid_split.json"
results = {}
rng = np.random.default_rng(0)
H, W = 1088, 1920
img = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
u = jnp.asarray(rng.uniform(-3, 3, (H, W)).astype(np.float32))
v = jnp.asarray(rng.uniform(-3, 3, (H, W)).astype(np.float32))
# smooth the fake flow so the tiled warp's per-tile deviation bound holds
for _ in range(2):
    u = downsample2x(u)
    v = downsample2x(v)
u = upsample_flow(Flow(u, v), (H, W)).u
v = upsample_flow(Flow(u[:272, :480], v[:272, :480]), (H, W)).v
uh = jnp.asarray(rng.uniform(-2, 2, (544, 960)).astype(np.float32))
vh = jnp.asarray(rng.uniform(-2, 2, (544, 960)).astype(np.float32))


def timeit(name, fn, n=50):
    t0 = time.time()
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t1 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t1) / n
    results[name] = round(dt * 1e3, 3)
    print(f"{name}: {dt*1e3:.3f} ms [compile {time.time()-t0:.0f}s]",
          flush=True)
    json.dump(results, open(OUT, "w"), indent=1)


warp_j = jax.jit(warp_bilinear_tiled)
timeit("warp_tiled_1080p", lambda: warp_j(img, u, v))
up_j = jax.jit(lambda a, b: upsample_flow(Flow(a, b), (H, W)))
timeit("upsample_540p_to_1080p", lambda: up_j(uh, vh))
down_j = jax.jit(downsample2x)
timeit("downsample_1080p", lambda: down_j(img))
print("DONE", flush=True)
