"""Post-aligned-optimization sweep: batched, pyramid, 4K."""
import sys, os, json; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig, PyramidConfig
from opticalflowhs_tpu.solver import hs_solve
from opticalflowhs_tpu.batch import hs_solve_batched
from opticalflowhs_tpu.pyramid import hs_pyramid

def sync(x): float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

rng = np.random.default_rng(0)
# batched 8x512x640
b1 = jnp.asarray(rng.uniform(0,1,(8,512,640)).astype(np.float32))
b2 = jnp.asarray(rng.uniform(0,1,(8,512,640)).astype(np.float32))
cfg = HSConfig(alpha=0.5, iters=100, backend='pallas')
f = hs_solve_batched(b1, b2, cfg); sync(f)
t0=time.perf_counter()
for _ in range(10): f = hs_solve_batched(b1, b2, cfg)
jax.block_until_ready(f)
dt=(time.perf_counter()-t0)/10
print(f'b8 512x640: {dt*1e3:.2f} ms ({8*512*640*100/dt/1e9:.1f} Gpx*sweep/s, {8/dt:.0f} fps)', flush=True)

# pyramid 1080p
i1 = jnp.asarray(rng.uniform(0,1,(1088,1920)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0,1,(1088,1920)).astype(np.float32))
f = hs_pyramid(i1, i2, cfg, PyramidConfig(levels=3)); sync(f)
t0=time.perf_counter()
for _ in range(5): f = hs_pyramid(i1, i2, cfg, PyramidConfig(levels=3))
jax.block_until_ready(f)
dt=(time.perf_counter()-t0)/5
print(f'pyramid3 1080p: {dt*1e3:.2f} ms ({1/dt:.1f} fps)', flush=True)

# 4K
k1 = jnp.asarray(rng.uniform(0,1,(2176,3840)).astype(np.float32))
k2 = jnp.asarray(rng.uniform(0,1,(2176,3840)).astype(np.float32))
f = hs_solve(k1, k2, cfg); sync(f)
t0=time.perf_counter()
for _ in range(5): f = hs_solve(k1, k2, cfg)
jax.block_until_ready(f)
dt=(time.perf_counter()-t0)/5
print(f'4k: {dt*1e3:.2f} ms ({2176*3840*100/dt/1e9:.1f} Gpx*sweep/s, {1/dt:.1f} fps)', flush=True)
