"""E2E on real TPU: config-5 degenerate tiled+egomotion, bf16 retry, bench.py smoke."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, subprocess
import jax, jax.numpy as jnp, numpy as np

# config 5 (degenerate 1x1 mesh on the single chip, pallas per-shard tile path)
from opticalflowhs_tpu.config import HSConfig, MeshConfig
from opticalflowhs_tpu.dist import hs_solve_tiled, make_mesh
from opticalflowhs_tpu.egomotion import estimate_egomotion
from opticalflowhs_tpu.data.synthetic import translation_pair

i1, i2, gt = translation_pair(512, 640, 1.5, -0.5, key=31)
mesh = make_mesh(MeshConfig(batch=1, y=1, x=1))
cfg = HSConfig(alpha=0.2, iters=300, backend='pallas')
t0 = time.perf_counter()
flow = hs_solve_tiled(jnp.asarray(i1), jnp.asarray(i2), cfg, mesh=mesh, halo_sweeps=4)
em = estimate_egomotion(flow)
print(f'config5-degenerate: tx={float(em.tx):.3f} ty={float(em.ty):.3f} '
      f'(want 1.5, -0.5) residual={float(em.residual):.4f} '
      f'[{time.perf_counter()-t0:.0f}s incl compile]', flush=True)

# bf16 pallas retry (new kernel structure)
rng = np.random.default_rng(0)
b1 = jnp.asarray(rng.uniform(0,1,(256,384)).astype(np.float32))
b2 = jnp.asarray(rng.uniform(0,1,(256,384)).astype(np.float32))
try:
    from opticalflowhs_tpu.solver import hs_solve
    fb = hs_solve(b1, b2, HSConfig(alpha=0.5, iters=50, backend='pallas', dtype='bfloat16'))
    print('bf16 pallas: OK mean u', float(jnp.mean(fb.u.astype(jnp.float32))), flush=True)
    fj = hs_solve(b1, b2, HSConfig(alpha=0.5, iters=50, backend='jnp', dtype='bfloat16'))
    print('bf16 pallas vs jnp max|d|:', float(jnp.abs(fb.u.astype(jnp.float32)-fj.u.astype(jnp.float32)).max()), flush=True)
except Exception as e:
    print(f'bf16 pallas: FAIL {type(e).__name__}: {str(e)[:150]}', flush=True)
