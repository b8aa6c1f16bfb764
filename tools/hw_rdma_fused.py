"""HW: fused in-kernel-RDMA ring solver vs ppermute tiled path (VERDICT
item 2 'done' bar): degenerate 1-chip ring, exactness + per-exchanged-sweep
latency comparison."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig, MeshConfig
from opticalflowhs_tpu.dist import hs_solve_tiled, make_mesh
from opticalflowhs_tpu.solver import hs_solve

mesh = make_mesh(MeshConfig(batch=1, y=1, x=1))
rng = np.random.default_rng(0)
# Tile sized like one chip's share of a 4K frame on a 4-8 chip ring; the
# fused kernel is whole-tile VMEM-resident (like _sweeps_vmem) so the tile
# must fit the ~100 MB budget with ~18 live arrays.
h, w, iters, s = 512, 1280, 96, 8
i1 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
i2 = jnp.asarray(rng.uniform(0,1,(h,w)).astype(np.float32))
cfg = HSConfig(alpha=0.5, iters=iters, backend="pallas")

# exactness first
fr = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=iters, backend="jnp")); float(jnp.sum(fr.u))
fd = hs_solve_tiled(i1, i2, cfg, mesh=mesh, halo_sweeps=s, halo_impl="rdma"); float(jnp.sum(fd.u))
print("rdma-fused vs untiled max diff:",
      max(float(jnp.abs(fd.u-fr.u).max()), float(jnp.abs(fd.v-fr.v).max())), flush=True)

def t(fn, n=10):
    fn(); 
    out = None
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n

d_rdma = t(lambda: hs_solve_tiled(i1, i2, cfg, mesh=mesh, halo_sweeps=s, halo_impl="rdma"))
d_pp   = t(lambda: hs_solve_tiled(i1, i2, cfg, mesh=mesh, halo_sweeps=s, halo_impl="ppermute"))
f = hs_solve(i1, i2, cfg); float(jnp.sum(f.u))
d_un   = t(lambda: hs_solve(i1, i2, cfg))
n_ex = iters // s
print(f"rdma-fused:  {d_rdma*1e3:.3f} ms ({h*w*iters/d_rdma/1e9:.2f} Gpx*sweep/s), {d_rdma/n_ex*1e6:.1f} us/exchanged-block", flush=True)
print(f"ppermute:    {d_pp*1e3:.3f} ms ({h*w*iters/d_pp/1e9:.2f} Gpx*sweep/s), {d_pp/n_ex*1e6:.1f} us/exchanged-block", flush=True)
print(f"untiled ref: {d_un*1e3:.3f} ms ({h*w*iters/d_un/1e9:.2f} Gpx*sweep/s)", flush=True)
