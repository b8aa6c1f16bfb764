"""HW: fused-megakernel grid depth — band height sweep at 1080p and 4K.

The even-split band sizing picks the FEWEST VMEM-fitting bands (minimal
pad waste), tuned in the multi-launch regime. The fused megakernel runs
the whole (n_blocks, bands) grid in one launch, where MORE, smaller bands
give Mosaic a deeper pipeline to hide window DMA behind compute. Sweep
HSFLOW_BAND_ROWS at fixed pixels; all variants are exact by construction
(covered by interpret-mode equivalence tests).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import importlib
import jax, jax.numpy as jnp, numpy as np


def bench(band, h, w, iters=100, s=16, n=10):
    os.environ["HSFLOW_BAND_ROWS"] = str(band)
    import opticalflowhs_tpu.kernels.jacobi as jk
    importlib.reload(jk)
    import opticalflowhs_tpu.solver as sv
    importlib.reload(sv)
    from opticalflowhs_tpu.config import HSConfig
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend="pallas", block_sweeps=s)
    tag = f"band{band or 'auto'} {h}x{w} i{iters} s{s}"
    try:
        f = sv.hs_solve(i1, i2, cfg)
        float(jnp.sum(f.u))
    except Exception as e:
        print(f"{tag}: FAIL {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        f = sv.hs_solve(i1, i2, cfg)
    jax.block_until_ready((f.u, f.v))
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:.3f} ms, {h*w*iters/dt/1e9:.2f} Gpx*sweeps/s",
          flush=True)


for band in [0, 272, 136, 64]:
    bench(band, 1088, 1920)      # auto = 544 (2 bands); deeper grids
for band in [0, 136, 64]:
    bench(band, 2176, 3840)      # auto = 272 (8 bands)
print("DONE", flush=True)
