"""HW: is the 1080p jnp-backend regression (round-2 7.5 -> round-4 14.9 ms)
the sqrt(n)-checkpoint loop structure? A/B flat fori_loop vs
stencils.checkpointed_loop on the real chip (CPU measures only +7%)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from opticalflowhs_tpu.ops import stencils

rng = np.random.default_rng(0)
h, w = 1088, 1920
i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
ex, ey, et = stencils.derivatives(i1, i2)
invd = 1.0 / (0.25 + ex * ex + ey * ey)
step = lambda uv: stencils.jacobi_step(uv[0], uv[1], ex, ey, et, invd)

@jax.jit
def flat(u, v):
    return lax.fori_loop(0, 100, lambda _, x: step(x), (u, v))

@jax.jit
def ckpt(u, v):
    return stencils.checkpointed_loop(step, (u, v), 100)

results = {}
u = jnp.zeros_like(ex)
v = jnp.zeros_like(ex)
for name, f in (("flat", flat), ("ckpt", ckpt)):
    out = f(u, v)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(u, v)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 50
    results[name + "_ms"] = round(dt * 1e3, 3)
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
json.dump(results, open("/tmp/hw_jnp_ckpt_ab.json", "w"), indent=1)
print("DONE", flush=True)

# Third leg (round-4 follow-up): nested scan-of-fori WITHOUT checkpoint —
# pins whether the 2.1x is the nesting or the remat wrapper.
@jax.jit
def nested(u, v):
    b = 10
    def block(x):
        return lax.fori_loop(0, b, lambda _, y: step(y), x)
    x, _ = lax.scan(lambda c, _: (block(c), None), (u, v), None, length=10)
    return x

out = nested(u, v)
float(jnp.sum(out[0]))
t0 = time.perf_counter()
for _ in range(50):
    out = nested(u, v)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 50
print(f"nested-nockpt: {dt*1e3:.3f} ms", flush=True)
results["nested_nockpt_ms"] = round(dt * 1e3, 3)
json.dump(results, open("/tmp/hw_jnp_ckpt_ab.json", "w"), indent=1)
print("DONE2", flush=True)
