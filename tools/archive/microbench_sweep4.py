"""Round 4: ref-state loops (no SSA carries) vs carried fori_loop."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SWEEPS = 100

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

def make_scratch_kernel(H, W, unroll=1):
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref):
        ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
        uo_ref[...] = u0_ref[...]
        vo_ref[...] = v0_ref[...]
        def body(_, x):
            u, v = uo_ref[...], vo_ref[...]
            for _k in range(unroll):
                u, v = sweep(u, v, ex, ey, et, invd, H, W)
            uo_ref[...] = u
            vo_ref[...] = v
            return x
        jax.lax.fori_loop(0, SWEEPS // unroll, body, 0)
    return kernel

def make_grid_kernel(H, W):
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            uo_ref[...] = u0_ref[...]
            vo_ref[...] = v0_ref[...]
        u, v = sweep(uo_ref[...], vo_ref[...],
                     ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...], H, W)
        uo_ref[...] = u
        vo_ref[...] = v
    return kernel

def make_scratch_carryonly(H, W):
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref):
        uo_ref[...] = u0_ref[...]
        vo_ref[...] = v0_ref[...]
        def body(_, x):
            uo_ref[...] = uo_ref[...]*1.0001 + 0.5
            vo_ref[...] = vo_ref[...]*1.0001 - 0.5
            return x
        jax.lax.fori_loop(0, SWEEPS, body, 0)
    return kernel

def run(name, kernel, H, W, grid=None):
    rng = np.random.default_rng(0)
    ins = [jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)) for _ in range(6)]
    out = jax.ShapeDtypeStruct((H, W), jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = dict(out_shape=(out, out), in_specs=[spec]*6, out_specs=(spec, spec),
                  compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024))
    if grid:
        bs = lambda: pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
        kwargs.update(grid=(grid,), in_specs=[bs() for _ in range(6)],
                      out_specs=(bs(), bs()),
                      compiler_params=pltpu.CompilerParams(
                          vmem_limit_bytes=110*1024*1024,
                          dimension_semantics=("arbitrary",)))
    f = jax.jit(lambda *a: pl.pallas_call(kernel, **kwargs)(*a))
    try:
        r = f(*ins); checksum = float(jnp.sum(r[0]))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
        return
    N = 5
    t0 = time.perf_counter()
    for _ in range(N): r = f(*ins)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.3f} ms ({H*W*SWEEPS/dt/1e9:.1f} Gpx*sweep/s) sum={checksum:.1f}", flush=True)

run("scratch-carryonly 1024x1280", make_scratch_carryonly(1024, 1280), 1024, 1280)
run("scratch-roll2     1024x1280", make_scratch_kernel(1024, 1280), 1024, 1280)
run("scratch-unroll5   1024x1280", make_scratch_kernel(1024, 1280, 5), 1024, 1280)
run("grid-roll2        1024x1280", make_grid_kernel(1024, 1280), 1024, 1280, grid=SWEEPS)
run("scratch-roll2      512x 640", make_scratch_kernel(512, 640), 512, 640)
