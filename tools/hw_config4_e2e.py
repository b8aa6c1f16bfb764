"""Config 4 full pipeline on TPU: disk frames -> native prefetch decode ->
streaming flow (banded kernel) -> .flo writes; end-to-end fps incl. IO.
Plus jax.profiler --profile-dir validation."""
import sys, os, glob; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.data.synthetic import synthetic_sequence
from opticalflowhs_tpu.io import native
from opticalflowhs_tpu.io.images import save_image
from opticalflowhs_tpu.video import flow_stream

D = '/tmp/c4_frames'
os.makedirs(D, exist_ok=True)
T = 33
frames, gt = synthetic_sequence(T, 720, 1280, tx=1.0, ty=0.0, key=5)
for k in range(T):
    save_image(f'{D}/f{k:04d}.pgm', frames[k])
print('native lib:', native.build(), flush=True)
paths = sorted(glob.glob(f'{D}/*.pgm'))

cfg = HSConfig(alpha=0.3, iters=100, backend='pallas')
# warm (compile) once with a tiny run
warm = list(flow_stream(frames[:9], cfg, chunk=8))
jax.block_until_ready(warm[-1])
float(jnp.sum(warm[-1].u))

t0 = time.perf_counter()
n_pairs = 0
mean_u = 0.0
for chunk in flow_stream(native.stream_frames(paths, n_threads=4, prefetch=12), cfg, chunk=8):
    n_pairs += int(chunk.u.shape[0])
    mean_u += float(jnp.sum(jnp.mean(chunk.u, axis=(1, 2))))
dt = time.perf_counter() - t0
print(f'config4 e2e: {n_pairs} pairs of 720p in {dt:.2f}s = {n_pairs/dt:.1f} fps '
      f'(decode+H2D+solve), mean u = {mean_u/n_pairs:+.3f} (true +1.0)', flush=True)

# profiler validation
prof_dir = '/tmp/hsflow_trace'
with jax.profiler.trace(prof_dir):
    from opticalflowhs_tpu.solver import hs_solve
    f = hs_solve(jnp.asarray(frames[0]), jnp.asarray(frames[1]), cfg)
    jax.block_until_ready(f)
found = []
for root, _, files in os.walk(prof_dir):
    found += [f for f in files if f.endswith(('.pb', '.json.gz', '.xplane.pb'))]
print(f'profiler trace files: {len(found)} {found[:3]}', flush=True)
