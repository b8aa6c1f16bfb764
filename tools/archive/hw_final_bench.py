"""Consolidated final HW bench: all sizes, writes RESULTS_HW.json as it goes."""
import sys, os, json; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig, PyramidConfig
from opticalflowhs_tpu.solver import hs_solve
from opticalflowhs_tpu.batch import hs_solve_batched
from opticalflowhs_tpu.pyramid import hs_pyramid

RESULTS = {}
OUT = '/root/repo/RESULTS_HW.json'

def record(key, val):
    RESULTS[key] = val
    with open(OUT, 'w') as f:
        json.dump(RESULTS, f, indent=2)
    print(f'{key}: {val}', flush=True)

def bench_fn(fn, args, n=10):
    f = fn(*args); float(jnp.sum(jax.tree_util.tree_leaves(f)[0]))
    t0 = time.perf_counter()
    for _ in range(n): f = fn(*args)
    jax.block_until_ready(f)
    return (time.perf_counter()-t0)/n, f

def frames(shape, b=None, seed=0):
    rng = np.random.default_rng(seed)
    sh = (b, *shape) if b else shape
    return (jnp.asarray(rng.uniform(0,1,sh).astype(np.float32)),
            jnp.asarray(rng.uniform(0,1,sh).astype(np.float32)))

def solve_bench(key, shape, iters, backend, n=10, **kw):
    i1, i2 = frames(shape)
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend, **kw)
    try:
        dt, f = bench_fn(lambda a,b: hs_solve(a,b,cfg), (i1,i2), n)
    except Exception as e:
        record(key, f'FAIL {type(e).__name__} {str(e)[:120]}')
        return None
    record(key, {'ms': round(dt*1e3,2), 'gpx_sweeps_s': round(shape[0]*shape[1]*iters/dt/1e9,2),
                 'fps': round(1/dt,1)})
    return f

# 1080p headline (solver auto picks banded)
f1 = solve_bench('1080p_pallas_i100', (1088,1920), 100, 'pallas')
f2 = solve_bench('1080p_jnp_i100', (1088,1920), 100, 'jnp', n=5)
if f1 is not None and f2 is not None:
    record('1080p_exactness', float(jnp.abs(f1.u-f2.u).max()))

# 4K
f3 = solve_bench('4k_pallas_i100', (2176,3840), 100, 'pallas', n=5)
f4 = solve_bench('4k_jnp_i100', (2176,3840), 100, 'jnp', n=3)
if f3 is not None and f4 is not None:
    record('4k_exactness', float(jnp.abs(f3.u-f4.u).max()))

# batched 720p retry and batched 1080p
for b, shape, key in [(4,(736,1280),'b4_720p_pallas'), (2,(1088,1920),'b2_1080p_pallas')]:
    i1, i2 = frames(shape, b=b)
    cfg = HSConfig(alpha=0.5, iters=100, backend='pallas')
    try:
        dt, f = bench_fn(lambda a,c: hs_solve_batched(a,c,cfg), (i1,i2), 5)
        record(key, {'ms': round(dt*1e3,2), 'fps': round(b/dt,1),
                     'gpx_sweeps_s': round(b*shape[0]*shape[1]*100/dt/1e9,2)})
    except Exception as e:
        record(key, f'FAIL {str(e)[:120]}')

# pyramid 3-level 1080p (config 3/4 combo)
i1, i2 = frames((1088,1920))
cfgp = HSConfig(alpha=0.5, iters=100, backend='pallas')
try:
    dt, _ = bench_fn(lambda a,b: hs_pyramid(a,b,cfgp,PyramidConfig(levels=3)), (i1,i2), 5)
    record('1080p_pyramid3_pallas', {'ms': round(dt*1e3,2), 'fps': round(1/dt,1)})
except Exception as e:
    record('1080p_pyramid3_pallas', f'FAIL {str(e)[:120]}')

# 8K stretch
solve_bench('8k_pallas_i50', (4352,7680), 50, 'pallas', n=3)

# 1024x1280 canonical (bench.py headline)
solve_bench('1024x1280_pallas_i100', (1024,1280), 100, 'pallas')
record('done', True)
