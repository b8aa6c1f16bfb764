"""Round 5: VMEM scratch state, sweep-count linearity, unrolling at 512x640."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def navg_roll2(u, H, W):
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    tu = pltpu.roll(u, shift=1, axis=0)
    td = pltpu.roll(u, shift=H-1, axis=0)
    tu = jnp.where(rows == 0, u, tu)
    td = jnp.where(rows == H-1, u, td)
    t = tu + 2.0*u + td
    lf = pltpu.roll(t, shift=W-1, axis=1)
    rt_ = pltpu.roll(t, shift=1, axis=1)
    lf = jnp.where(cols == W-1, t, lf)
    rt_ = jnp.where(cols == 0, t, rt_)
    return (lf + 2.0*t + rt_)*(1/12.0) - u*(1/3.0)

def sweep(u, v, ex, ey, et, invd, H, W):
    ub = navg_roll2(u, H, W)
    vb = navg_roll2(v, H, W)
    frac = (ex*ub + ey*vb + et) * invd
    return ub - ex*frac, vb - ey*frac

def make_scratchmem_kernel(H, W, sweeps, unroll=1):
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref, us, vs):
        ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
        us[...] = u0_ref[...]
        vs[...] = v0_ref[...]
        def body(_, x):
            u, v = us[...], vs[...]
            for _k in range(unroll):
                u, v = sweep(u, v, ex, ey, et, invd, H, W)
            us[...] = u
            vs[...] = v
            return x
        jax.lax.fori_loop(0, sweeps // unroll, body, 0)
        uo_ref[...] = us[...]
        vo_ref[...] = vs[...]
    return kernel

def make_fullunroll_kernel(H, W, sweeps):
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref):
        ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
        u, v = u0_ref[...], v0_ref[...]
        for _ in range(sweeps):
            u, v = sweep(u, v, ex, ey, et, invd, H, W)
        uo_ref[...] = u
        vo_ref[...] = v
    return kernel

def run(name, kernel, H, W, sweeps, scratch=False):
    rng = np.random.default_rng(0)
    ins = [jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)) for _ in range(6)]
    out = jax.ShapeDtypeStruct((H, W), jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = dict(out_shape=(out, out), in_specs=[spec]*6, out_specs=(spec, spec),
                  compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024))
    if scratch:
        kwargs['scratch_shapes'] = [pltpu.VMEM((H, W), jnp.float32)]*2
    f = jax.jit(lambda *a: pl.pallas_call(kernel, **kwargs)(*a))
    try:
        t0 = time.perf_counter()
        r = f(*ins); checksum = float(jnp.sum(r[0]))
        tc = time.perf_counter()-t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
        return
    N = 5
    t0 = time.perf_counter()
    for _ in range(N): r = f(*ins)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.3f} ms ({H*W*sweeps/dt/1e9:.1f} Gpx*sweep/s) compile {tc:.0f}s sum={checksum:.1f}", flush=True)

run("scrmem-s100   512x 640", make_scratchmem_kernel(512, 640, 100), 512, 640, 100, scratch=True)
run("scrmem-s400   512x 640", make_scratchmem_kernel(512, 640, 400), 512, 640, 400, scratch=True)
run("scrmem-unr10  512x 640", make_scratchmem_kernel(512, 640, 100, 10), 512, 640, 100, scratch=True)
run("fullunroll100 512x 640", make_fullunroll_kernel(512, 640, 100), 512, 640, 100)
run("scrmem-s100  1024x1280", make_scratchmem_kernel(1024, 1280, 100), 1024, 1280, 100, scratch=True)
