"""HW: device-side rate of temporal warm-start streaming (round 4).

flow_stream_warm's wall rate on THIS machine is tunnel-H2D-bound
(~290 ms/pair moving 1080p frames through the remote tunnel); this probe
holds the whole sequence device-resident and chains the sequential
warm-started solves to measure what a real TPU host (frames arriving by
DMA) would sustain."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import jax, jax.numpy as jnp, numpy as np
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import Flow, hs_solve
from opticalflowhs_tpu.data.synthetic import synthetic_sequence

frames_np, gt = synthetic_sequence(9, 1088, 1920, tx=1.0, ty=0.5, key=2)
frames = jax.device_put(jnp.asarray(frames_np))
cfg = HSConfig(alpha=0.2, iters=30, backend="pallas")

def run_seq(prev):
    for k in range(8):
        init = None if prev is None else Flow(prev.u, prev.v)
        prev = hs_solve(frames[k], frames[k + 1], cfg, init=init)
    return prev

out = run_seq(None)
float(jnp.sum(out.u))  # force both (cold + warm) compiles
n = 10
t0 = time.perf_counter()
prev = out
for _ in range(n):
    prev = run_seq(prev)  # steady-state: every solve warm-started
jax.block_until_ready(prev)
dt = (time.perf_counter() - t0) / (n * 8)
u = np.asarray(prev.u)[16:-16, 16:-16]
e = float(np.sqrt((u - gt[0])**2).mean())
print(f"warm stream device-side, 1080p i30: {dt*1e3:.3f} ms/pair "
      f"({1/dt:.0f} fps), |u-gt| {e:.4f}", flush=True)
json.dump({"ms_per_pair": round(dt*1e3, 3), "fps": round(1/dt, 1)},
          open("/tmp/hw_warm_rate.json", "w"))
print("DONE", flush=True)

# -- round 5: the fused lax.scan warm chain (ONE dispatch per window) ---------
from opticalflowhs_tpu.video import _warm_scan

p1, p2 = frames[:-1], frames[1:]


def run_scan(prev):
    us, vs = _warm_scan(p1, p2, prev.u, prev.v, cfg, 1.0, False)
    return Flow(us[-1], vs[-1])


out2 = run_scan(out)
float(jnp.sum(out2.u))
t0 = time.perf_counter()
prev = out2
for _ in range(n):
    prev = run_scan(prev)
jax.block_until_ready(prev)
dt2 = (time.perf_counter() - t0) / (n * 8)
d = float(jnp.abs(prev.u - jnp.asarray(np.asarray(out.u))).max())
print(f"warm stream FUSED scan, 1080p i30: {dt2*1e3:.3f} ms/pair "
      f"({1/dt2:.0f} fps) — {dt/dt2:.2f}x the per-call path", flush=True)
json.dump({"ms_per_pair_percall": round(dt*1e3, 3),
           "ms_per_pair_scan": round(dt2*1e3, 3),
           "fps_scan": round(1/dt2, 1)},
          open("/tmp/hw_warm_rate.json", "w"))
print("DONE2", flush=True)
