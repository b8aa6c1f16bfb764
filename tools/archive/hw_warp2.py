"""Patch-gather warp: one lax.gather of 2x2 patches vs four scalar gathers."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

H, W = 1088, 1920
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
u = jnp.asarray(rng.uniform(-8,8,(H,W)).astype(np.float32))
v = jnp.asarray(rng.uniform(-8,8,(H,W)).astype(np.float32))

def warp_patch(img, u, v):
    h, w = img.shape[-2:]
    dtype = img.dtype
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sy = jnp.clip(yy + v.astype(jnp.float32), 0.0, h - 1.0)
    sx = jnp.clip(xx + u.astype(jnp.float32), 0.0, w - 1.0)
    y0 = jnp.floor(sy); x0 = jnp.floor(sx)
    wy = (sy - y0).astype(dtype); wx = (sx - x0).astype(dtype)
    # clamp so the 2x2 patch stays in bounds (gather also clamps, but keep
    # weights consistent: at the high edge frac is 0 so row/col 1 is unused)
    y0i = jnp.minimum(y0.astype(jnp.int32), h - 2)
    x0i = jnp.minimum(x0.astype(jnp.int32), w - 2)
    wy = jnp.where(y0.astype(jnp.int32) > h - 2, jnp.ones_like(wy), wy)
    wx = jnp.where(x0.astype(jnp.int32) > w - 2, jnp.ones_like(wx), wx)
    idx = jnp.stack([y0i.reshape(-1), x0i.reshape(-1)], axis=-1)  # (HW, 2)
    patches = lax.gather(
        img, idx,
        lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2), mode=lax.GatherScatterMode.CLIP,
    )  # (HW, 2, 2)
    p = patches.reshape(h, w, 2, 2)
    top = p[..., 0, 0] * (1 - wx) + p[..., 0, 1] * wx
    bot = p[..., 1, 0] * (1 - wx) + p[..., 1, 1] * wx
    return top * (1 - wy) + bot * wy

from opticalflowhs_tpu.pyramid import warp_bilinear
a = warp_bilinear(img[:64,:128], u[:64,:128]*0.4, v[:64,:128]*0.4)
b = warp_patch(img[:64,:128], u[:64,:128]*0.4, v[:64,:128]*0.4)
print('patch-warp maxdiff vs reference:', float(jnp.abs(a-b).max()), flush=True)

def t(name, fn, n=10):
    f = jax.jit(fn)
    r = f(img, u, v); float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n): r = f(img, u, v)
    jax.block_until_ready(r)
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms', flush=True)

t('warp_patch 1080p', warp_patch)
