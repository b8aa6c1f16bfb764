"""Round 7: stacked-uv navg (halve dispatches) vs current, outref state."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1024, 1280
SWEEPS = 100

def make_current():
    from opticalflowhs_tpu.kernels.jacobi import _kernel_step, _edge_masks
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref):
        ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
        gr = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        masks = _edge_masks(gr, gc, H, W)
        uo_ref[...] = u0_ref[...]
        vo_ref[...] = v0_ref[...]
        def body(_, c):
            u, v = _kernel_step(uo_ref[...], vo_ref[...], ex, ey, et, invd, masks)
            uo_ref[...] = u
            vo_ref[...] = v
            return c
        jax.lax.fori_loop(0, SWEEPS, body, 0)
    return kernel, False

def make_stacked():
    def kernel(ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, z_ref, vo_ref):
        ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
        gr2 = jax.lax.broadcasted_iota(jnp.int32, (2*H, W), 0) % H
        gc2 = jax.lax.broadcasted_iota(jnp.int32, (2*H, W), 1)
        m_top = gr2 == 0
        m_bot = gr2 == H - 1
        m_lf = gc2 == 0
        m_rt = gc2 == W - 1
        z_ref[:H] = u0_ref[...]
        z_ref[H:] = v0_ref[...]
        def navg2(a):
            up = jnp.where(m_top, a, pltpu.roll(a, shift=1, axis=0))
            dn = jnp.where(m_bot, a, pltpu.roll(a, shift=2*H - 1, axis=0))
            t = up + 2.0*a + dn
            rt = jnp.where(m_lf, t, pltpu.roll(t, shift=1, axis=1))
            lf = jnp.where(m_rt, t, pltpu.roll(t, shift=W - 1, axis=1))
            return (rt + 2.0*t + lf) * (1.0/12.0) - a * (1.0/3.0)
        def body(_, c):
            zb = navg2(z_ref[...])
            ub, vb = zb[:H], zb[H:]
            frac = (ex*ub + ey*vb + et) * invd
            z_ref[:H] = ub - ex*frac
            z_ref[H:] = vb - ey*frac
            return c
        jax.lax.fori_loop(0, SWEEPS, body, 0)
        vo_ref[...] = z_ref[H:]
    return kernel, True

def run(name, maker):
    kernel, stacked = maker()
    rng = np.random.default_rng(0)
    ins = [jnp.asarray(rng.uniform(0,1,(H,W)).astype(np.float32)) for _ in range(6)]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if stacked:
        outs = (jax.ShapeDtypeStruct((2*H, W), jnp.float32), jax.ShapeDtypeStruct((H, W), jnp.float32))
    else:
        outs = (jax.ShapeDtypeStruct((H, W), jnp.float32),)*2
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel, out_shape=outs, in_specs=[spec]*6, out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024))(*a))
    try:
        r = f(*ins); s = float(jnp.sum(r[1]))
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__} {str(e)[:140]}', flush=True)
        return
    N = 5
    t0 = time.perf_counter()
    for _ in range(N): r = f(*ins)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/N
    print(f'{name}: {dt*1e3:.3f} ms ({H*W*SWEEPS/dt/1e9:.1f} Gpx*sweep/s) sum_v={s:.2f}', flush=True)

run('current', make_current)
run('stacked', make_stacked)
