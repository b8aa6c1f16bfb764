"""HW: where do warp_bilinear_tiled's 4.0 ms go at 1080p? (round 4)

Times the warp's stages as separate jits: edge-pad, the 510-block coarse
lax.gather, the tile4 transposes, and the (2R+2-1)^2 select loop. Guides
whether a Mosaic warp kernel could beat the XLA formulation (per-op
analysis says the select loop should be ~0.15 ms and the gather is the
suspect). Writes /tmp/hw_warp_split.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.pyramid import _WARP_R, _WARP_TH, _WARP_TW

H, W = 1088, 1920
th, tw, r = _WARP_TH, _WARP_TW, _WARP_R
k = 2 * r + 2
nh, nw = -(-H // th), -(-W // tw)
e_margin = 64
pad = e_margin + max(th, tw) + k + 2
bh, bw = th + k, tw + k

rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
byt = jnp.asarray(rng.integers(-3, 3, (nh, nw)).astype(np.int32))
bxt = jnp.asarray(rng.integers(-3, 3, (nh, nw)).astype(np.int32))
code = jnp.asarray(rng.integers(0, (k - 1) ** 2, (nh, nw, th, tw)).astype(np.int32))
imgp_c = jnp.asarray(np.pad(np.asarray(img), pad, mode="edge"))
blocks_c = jnp.asarray(rng.uniform(0, 1, (nh, nw, bh, bw)).astype(np.float32))

results = {}


def timeit(name, fn, *args, n=50):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    results[name] = round(dt * 1e3, 3)
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    json.dump(results, open("/tmp/hw_warp_split.json", "w"), indent=1)


timeit("pad_edge", lambda a: jnp.pad(a, pad, mode="edge"), img)


def gather(imgp, by, bx):
    oy = jnp.arange(nh, dtype=jnp.int32) * th
    ox = jnp.arange(nw, dtype=jnp.int32) * tw
    sy = oy[:, None] + by - r + pad
    sx = ox[None, :] + bx - r + pad
    starts = jnp.stack([sy.reshape(-1), sx.reshape(-1)], axis=-1)
    return jax.lax.gather(
        imgp, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
        ),
        slice_sizes=(bh, bw),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(nh, nw, bh, bw)


timeit("block_gather_510", gather, imgp_c, byt, bxt)


def tile4_untile(a):
    hp, wp = nh * th, nw * tw
    a = jnp.pad(a, ((0, hp - H), (0, wp - W)), mode="edge")
    t = a.reshape(nh, th, nw, tw).transpose(0, 2, 1, 3)
    return t.transpose(0, 2, 1, 3).reshape(hp, wp)[:H, :W]


timeit("tile4_plus_untile", tile4_untile, img)


def selects(blocks, codes):
    z = jnp.zeros((nh, nw, th, tw), jnp.float32)
    p00, p01, p10, p11 = z, z, z, z
    for a in range(k - 1):
        for b in range(k - 1):
            m = codes == (a * k + b)
            p00 = jnp.where(m, blocks[:, :, a : a + th, b : b + tw], p00)
            p01 = jnp.where(m, blocks[:, :, a : a + th, b + 1 : b + 1 + tw], p01)
            p10 = jnp.where(m, blocks[:, :, a + 1 : a + 1 + th, b : b + tw], p10)
            p11 = jnp.where(m, blocks[:, :, a + 1 : a + 1 + th, b + 1 : b + 1 + tw], p11)
    return p00 + p01 + p10 + p11


timeit("select_loop_81x", selects, blocks_c, code)
print("DONE", flush=True)


def selects_hoisted(blocks, codes):
    """Same arithmetic, b-slicing (LANE dim) hoisted out of the a-loop:
    10 lane-unaligned slices total instead of 324."""
    z = jnp.zeros((nh, nw, th, tw), jnp.float32)
    p00, p01, p10, p11 = z, z, z, z
    bb = blocks[:, :, :, 0:tw]
    for b in range(k - 1):
        bb1 = blocks[:, :, :, b + 1 : b + 1 + tw]
        for a in range(k - 1):
            m = codes == (a * k + b)
            p00 = jnp.where(m, bb[:, :, a : a + th, :], p00)
            p01 = jnp.where(m, bb1[:, :, a : a + th, :], p01)
            p10 = jnp.where(m, bb[:, :, a + 1 : a + 1 + th, :], p10)
            p11 = jnp.where(m, bb1[:, :, a + 1 : a + 1 + th, :], p11)
        bb = bb1
    return p00 + p01 + p10 + p11


timeit("select_loop_hoisted", selects_hoisted, blocks_c, code)
ref = jax.jit(selects)(blocks_c, code)
got = jax.jit(selects_hoisted)(blocks_c, code)
print("hoisted maxdiff:", float(jnp.abs(ref - got).max()), flush=True)
print("DONE2", flush=True)
