"""Isolate the bf16 Mosaic compile failure, primitive by primitive."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 384
x = jnp.asarray(np.random.default_rng(0).uniform(0,1,(H,W)).astype(np.float32)).astype(jnp.bfloat16)

def run(name, kernel):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        f = jax.jit(lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((H, W), jnp.bfloat16),
            in_specs=[spec], out_specs=spec)(a))
        r = f(x); s = float(jnp.sum(r.astype(jnp.float32)))
        print(f'{name}: OK sum={s:.1f}', flush=True)
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__} {str(e)[:120]}', flush=True)

run('pointwise', lambda i, o: o.__setitem__(..., i[...] * 2.0))

def k_roll0(i, o): o[...] = pltpu.roll(i[...], shift=1, axis=0)
run('roll axis0', k_roll0)

def k_roll1(i, o): o[...] = pltpu.roll(i[...], shift=1, axis=1)
run('roll axis1', k_roll1)

def k_where(i, o):
    gr = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    o[...] = jnp.where(gr == 0, i[...], i[...] * 2.0)
run('iota-where', k_where)

def k_sweepish(i, o):
    a = i[...]
    gr = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    up = jnp.where(gr == 0, a, pltpu.roll(a, shift=1, axis=0))
    dn = jnp.where(gr == H-1, a, pltpu.roll(a, shift=H-1, axis=0))
    t = up + 2.0*a + dn
    rt = jnp.where(gc == 0, t, pltpu.roll(t, shift=1, axis=1))
    lf = jnp.where(gc == W-1, t, pltpu.roll(t, shift=W-1, axis=1))
    o[...] = (rt + 2.0*t + lf) * (1.0/12.0) - a * (1.0/3.0)
run('full-navg', k_sweepish)

def k_fori(i, o):
    o[...] = i[...]
    def body(_, c):
        o[...] = o[...] * 1.001
        return c
    jax.lax.fori_loop(0, 10, body, 0)
run('fori-outref', k_fori)
