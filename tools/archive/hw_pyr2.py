"""HW: pyramid after tiled warp + downsample fix."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig, PyramidConfig
from opticalflowhs_tpu.pyramid import hs_pyramid, warp_bilinear_tiled, downsample2x

H, W = 1088, 1920
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
img2 = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
u = jnp.asarray((8*np.sin(np.arange(H)/H*3.1)[:,None]*np.cos(np.arange(W)/W*2.0)[None,:]).astype(np.float32))
v = 0.7*u

def t(name, fn, *args, n=10):
    f = jax.jit(fn)
    r = f(*args); float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms', flush=True)

t('warp_tiled 1080p', warp_bilinear_tiled, img, u, v)
t('downsample2x 1080p (new)', downsample2x, img)
cfg = HSConfig(alpha=0.5, iters=100, backend='pallas')
t('pyramid3 1080p pallas', lambda a,b: hs_pyramid(a,b,cfg,PyramidConfig(levels=3)), img, img2, n=5)
cfgj = HSConfig(alpha=0.5, iters=100, backend='jnp')
t('pyramid3 1080p jnp', lambda a,b: hs_pyramid(a,b,cfgj,PyramidConfig(levels=3)), img, img2, n=5)
