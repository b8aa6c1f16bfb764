"""Break down 1080p pyramid cost: blur/downsample, warp, upsample, solves."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.pyramid import downsample2x, warp_bilinear, upsample_flow
from opticalflowhs_tpu.solver import Flow

H, W = 1088, 1920
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32))
u = jnp.asarray(rng.uniform(-8,8,(H,W)).astype(np.float32))
v = jnp.asarray(rng.uniform(-8,8,(H,W)).astype(np.float32))
small = Flow(u[::2,::2]*0.5, v[::2,::2]*0.5)

def t(name, fn, *args, n=10):
    f = jax.jit(fn)
    try:
        r = f(*args); float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    except Exception as e:
        print(f'{name}: FAIL {str(e)[:120]}', flush=True); return
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms', flush=True)

t('downsample2x 1080p', downsample2x, img)
t('warp_bilinear 1080p', warp_bilinear, img, u, v)
t('upsample_flow ->1080p', lambda s_u, s_v: upsample_flow(Flow(s_u, s_v), (H, W)), small.u, small.v)

# candidate warp formulations
def warp_tal(img, u, v):
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sy = jnp.clip(yy + v, 0.0, h - 1.0); sx = jnp.clip(xx + u, 0.0, w - 1.0)
    y0 = jnp.floor(sy); x0 = jnp.floor(sx)
    wy = sy - y0; wx = sx - x0
    y0i = y0.astype(jnp.int32); x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i+1, h-1); x1i = jnp.minimum(x0i+1, w-1)
    r0 = jnp.take_along_axis(img, y0i, axis=0)   # wrong: needs row gather per (y,x)... placeholder cost probe
    r1 = jnp.take_along_axis(img, y1i, axis=0)
    p00 = jnp.take_along_axis(r0, x0i, axis=1)
    p01 = jnp.take_along_axis(r0, x1i, axis=1)
    p10 = jnp.take_along_axis(r1, x0i, axis=1)
    p11 = jnp.take_along_axis(r1, x1i, axis=1)
    top = p00*(1-wx)+p01*wx; bot = p10*(1-wx)+p11*wx
    return top*(1-wy)+bot*wy

t('warp take_along_axis', warp_tal, img, u, v)

def warp_offset_rolls(img, u, v, D=16):
    """Vertical offsets via roll loop + horizontal via take_along_axis rows."""
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sy = jnp.clip(yy + v, 0.0, h - 1.0); sx = jnp.clip(xx + u, 0.0, w - 1.0)
    y0 = jnp.floor(sy); x0 = jnp.floor(sx)
    wy = (sy - y0)
    dy = jnp.clip(y0 - yy, -D, D).astype(jnp.int32)  # bounded vertical offset
    x0i = x0.astype(jnp.int32); x1i = jnp.minimum(x0i+1, w-1)
    wx = sx - x0
    r0 = jnp.zeros_like(img); r1 = jnp.zeros_like(img)
    for d in range(-D, D+1):
        rolled = jnp.roll(img, -d, axis=0)
        rolled1 = jnp.roll(img, -(d+1), axis=0)
        m = dy == d
        r0 = jnp.where(m, rolled, r0)
        r1 = jnp.where(m, rolled1, r1)
    p00 = jnp.take_along_axis(r0, x0i, axis=1)
    p01 = jnp.take_along_axis(r0, x1i, axis=1)
    p10 = jnp.take_along_axis(r1, x0i, axis=1)
    p11 = jnp.take_along_axis(r1, x1i, axis=1)
    top = p00*(1-wx)+p01*wx; bot = p10*(1-wx)+p11*wx
    return top*(1-wy)+bot*wy

t('warp v-rolls D16 + h-gather', warp_offset_rolls, img, u, v)

def warp_allrolls(img, u, v, D=16):
    """Both axes via bounded roll loops: zero gathers."""
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sy = jnp.clip(yy + v, 0.0, h - 1.0); sx = jnp.clip(xx + u, 0.0, w - 1.0)
    y0 = jnp.floor(sy); x0 = jnp.floor(sx)
    wy = sy - y0; wx = sx - x0
    dy = jnp.clip(y0 - yy, -D, D).astype(jnp.int32)
    dx = jnp.clip(x0 - xx, -D, D).astype(jnp.int32)
    r0 = jnp.zeros_like(img); r1 = jnp.zeros_like(img)
    for d in range(-D, D+1):
        m = dy == d
        r0 = jnp.where(m, jnp.roll(img, -d, axis=0), r0)
        r1 = jnp.where(m, jnp.roll(img, -(d+1), axis=0), r1)
    p00 = jnp.zeros_like(img); p01 = jnp.zeros_like(img)
    p10 = jnp.zeros_like(img); p11 = jnp.zeros_like(img)
    for d in range(-D, D+1):
        m = dx == d
        p00 = jnp.where(m, jnp.roll(r0, -d, axis=1), p00)
        p01 = jnp.where(m, jnp.roll(r0, -(d+1), axis=1), p01)
        p10 = jnp.where(m, jnp.roll(r1, -d, axis=1), p10)
        p11 = jnp.where(m, jnp.roll(r1, -(d+1), axis=1), p11)
    top = p00*(1-wx)+p01*wx; bot = p10*(1-wx)+p11*wx
    return top*(1-wy)+bot*wy

t('warp all-rolls D16', warp_allrolls, img, u, v)

# correctness crosscheck on CPU-sized case
from opticalflowhs_tpu.pyramid import warp_bilinear as wb
small_img = img[:64, :128]; su = u[:64, :128]*0.4; sv = v[:64, :128]*0.4
a = wb(small_img, su, sv)
b = warp_offset_rolls(small_img, su, sv, D=16)
c = warp_allrolls(small_img, su, sv, D=16)
print('offset-rolls maxdiff:', float(jnp.abs(a-b).max()), flush=True)
print('all-rolls maxdiff:', float(jnp.abs(a-c).max()), flush=True)
