"""Round 2: isolate sweep cost components + fixed MXU variant. 1024x1280, 100 sweeps."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1024, 1280
SWEEPS = 100

def make_inputs():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)) for _ in range(6)]

def sl(a): return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
def sr(a): return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
def su(a): return jnp.concatenate([a[1:, :], a[-1:, :]], axis=0)
def sd(a): return jnp.concatenate([a[:1, :], a[:-1, :]], axis=0)

def navg_full(u):
    up, dn, lf, rt = sd(u), su(u), sr(u), sl(u)
    return (up+dn+lf+rt)/6.0 + (sr(up)+sl(up)+sr(dn)+sl(dn))/12.0

def navg_pointwise(u):  # WRONG math; measures no-shift ceiling
    return u*0.5 + u*u*0.1 + 0.25*u + 0.125*u + u*0.05 + u*0.02 + u*0.01 + u*0.005

def navg_rows_only(u):  # WRONG math; sublane shifts only
    t = sd(u) + 2.0*u + su(u)
    t2 = sd(t) + 2.0*t + su(t)
    return t2*(1/12.0) - u*(1/3.0)

def navg_cols_only(u):  # WRONG math; lane shifts only
    t = sr(u) + 2.0*u + sl(u)
    t2 = sr(t) + 2.0*t + sl(t)
    return t2*(1/12.0) - u*(1/3.0)

def navg_roll2(u, rows, cols):  # roll on both axes
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

def navg_mxu(u, tmat):
    t = sd(u) + 2.0*u + su(u)
    nw = W // 128
    t3 = t.reshape(H, nw, 128)
    s3 = jax.lax.dot_general(t3, tmat, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = s3.reshape(H, W)
    for k in range(nw):
        j0, j1 = k*128, k*128+127
        s = s.at[:, j0].add(t[:, j0-1] if k > 0 else t[:, 0])
        s = s.at[:, j1].add(t[:, j1+1] if k < nw-1 else t[:, j1])
    return s*(1/12.0) - u*(1/3.0)

def make_kernel(navg, mode=None):
    def kernel(*refs):
        if mode == 'mxu':
            ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, tm_ref, uo_ref, vo_ref = refs
            extra = (tm_ref[...],)
        else:
            ex_ref, ey_ref, et_ref, invd_ref, u0_ref, v0_ref, uo_ref, vo_ref = refs
            if mode == 'roll2':
                extra = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0),
                         jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
            else:
                extra = ()
        ex, ey, et, invd = ex_ref[...], ey_ref[...], et_ref[...], invd_ref[...]
        def body(_, uv):
            u, v = uv
            ub = navg(u, *extra)
            vb = navg(v, *extra)
            frac = (ex*ub + ey*vb + et) * invd
            return (ub - ex*frac, vb - ey*frac)
        u, v = jax.lax.fori_loop(0, SWEEPS, body, (u0_ref[...], v0_ref[...]))
        uo_ref[...] = u
        vo_ref[...] = v
    return kernel

def run(name, kernel, nin):
    ins = make_inputs()
    if nin == 7:
        t = np.zeros((128, 128), np.float32)
        for j in range(128):
            t[j, j] = 2.0
            if j > 0: t[j-1, j] = 1.0
            if j < 127: t[j+1, j] = 1.0
        ins = ins[:6] + [jnp.asarray(t)]
    else:
        ins = ins[:6]
    out = jax.ShapeDtypeStruct((H, W), jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel, out_shape=(out, out), in_specs=[spec]*nin, out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(*a))
    try:
        r = f(*[ins[4], ins[5], *ins[:4]][0:0] or ins)  # noqa
        checksum = float(jnp.sum(r[0]))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    N = 5
    t0 = time.perf_counter()
    for _ in range(N): r = f(*ins)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/N
    print(f"{name}: {dt*1e3:.3f} ms ({H*W*SWEEPS/dt/1e9:.1f} Gpx*sweep/s) sum={checksum:.1f}", flush=True)

run("full-concat ", make_kernel(lambda u: navg_full(u)), 6)
run("pointwise   ", make_kernel(lambda u: navg_pointwise(u)), 6)
run("rows-only   ", make_kernel(lambda u: navg_rows_only(u)), 6)
run("cols-only   ", make_kernel(lambda u: navg_cols_only(u)), 6)
run("roll2       ", make_kernel(navg_roll2, mode='roll2'), 6)
run("mxu         ", make_kernel(navg_mxu, mode='mxu'), 7)
