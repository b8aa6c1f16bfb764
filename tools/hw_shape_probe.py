"""HW: window-shape effect on banded-kernel throughput at fixed pixel count.

RESULTS_HW regen showed 4K (windows 304x3840) at ~0.63 us/vector-op vs
1080p (windows 576x1920) at ~1.75 us/op — same elements per op. If wide-flat
shapes are intrinsically faster on the VPU, packing segments of a tall
image side-by-side along lanes is a big single-frame lever. All shapes
below are ~2.09 Mpx (the 1080p pixel count).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.kernels import jacobi as jk


def run(h, w, iters=100, s=16, n=10):
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.uniform(-1, 1, (h, w)).astype(np.float32))
    ex, ey, et = mk(), mk(), mk()
    invd = 1.0 / (0.25 + ex * ex + ey * ey)
    u = jnp.zeros_like(ex)
    v = jnp.zeros_like(ex)

    @jax.jit
    def f(u, v, ex, ey, et, invd):
        return jk.jacobi_sweeps(u, v, ex, ey, et, invd, iters, block_sweeps=s)

    try:
        out = f(u, v, ex, ey, et, invd)
        float(jnp.sum(out[0]))
    except Exception as e:
        print(f"{h}x{w}: FAIL {str(e)[:160]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(u, v, ex, ey, et, invd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{h}x{w}: {dt*1e3:.3f} ms, {h*w*iters/dt/1e9:.2f} Gpx*sweeps/s",
          flush=True)


for shape in [(1088, 1920), (544, 3840), (272, 7680), (136, 15360),
              (2176, 960), (1024, 1280), (512, 2560)]:
    run(*shape)
print("DONE", flush=True)
