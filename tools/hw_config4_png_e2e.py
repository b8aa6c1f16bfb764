"""Config 4 over a PNG directory: native OpenCV decode in the threaded
prefetch loader (round 2, VERDICT item 9) -> streaming flow -> host copy.
Also exercises the CLI video path routing (native.can_decode)."""
import sys, os, glob; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.data.synthetic import synthetic_sequence
from opticalflowhs_tpu.io import native
from opticalflowhs_tpu.io.images import save_image
from opticalflowhs_tpu.video import flow_stream, flow_video

D = '/tmp/c4_png'
os.makedirs(D, exist_ok=True)
T = 17
frames, gt = synthetic_sequence(T, 720, 1280, tx=1.0, ty=0.0, key=5)
for k in range(T):
    save_image(f'{D}/f{k:04d}.png', frames[k])
print('native lib:', native.build(), 'codecs:', native.codecs(), flush=True)
paths = sorted(glob.glob(f'{D}/*.png'))
assert all(native.can_decode(p) for p in paths), "OpenCV codecs missing"

cfg = HSConfig(alpha=0.3, iters=100, backend='pallas')
warm = list(flow_stream(frames[:9], cfg, chunk=8))
jax.block_until_ready(warm[-1]); float(jnp.sum(warm[-1].u))

t0 = time.perf_counter()
n_pairs, mean_u = 0, 0.0
for chunk in flow_stream(native.stream_frames(paths, n_threads=4, prefetch=12), cfg, chunk=8):
    n_pairs += int(chunk.u.shape[0])
    mean_u += float(jnp.sum(jnp.mean(chunk.u, axis=(1, 2))))
dt = time.perf_counter() - t0
print(f'config4 PNG e2e: {n_pairs} pairs of 720p in {dt:.2f}s = {n_pairs/dt:.1f} fps, '
      f'mean u = {mean_u/n_pairs:+.3f} (true +1.0)', flush=True)

# flow_video host-copy convenience (bounded device memory)
fv = flow_video(frames[:9], cfg, chunk=4)
print('flow_video host result:', type(fv.u).__name__, fv.u.shape,
      'mean u', float(np.mean(fv.u)), flush=True)
print('DONE', flush=True)
