"""HW probe (round-5 VERDICT item 7): close the 8K u/v-strip-wavefront
question with data.

The hypothesized schedule splits an 8K frame into vertical strips whose
u/v stay VMEM-resident (wavefront-skewed) while fields stream — its best
case is each strip solving at the skewed kernel's rate with ZERO
inter-strip halo cost. This probe measures exactly that upper bound: the
u/v-resident skewed kernel on ONE (4352, 960) strip (1/8 of 8K), plus the
8K banded baseline in the same process. If the no-overhead strip rate
does not beat the banded 8K rate by >= 10%, the strip schedule cannot win
even before paying its per-sweep column halos -> measured dead end.
Writes /tmp/hw_8k_strip.json.
"""
import os
os.environ["HSFLOW_SKEWED_MIN_PX"] = "1000000"  # probe: admit the 4.2 Mpx strip
import sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve
from opticalflowhs_tpu.kernels.solve_skewed import hs_solve_skewed

OUT = "/tmp/hw_8k_strip.json"
results = {}


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=20):
    out = fn()
    sync(out)
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
IT = 50

# leg 1: one 8K strip on the u/v-resident skewed kernel (upper bound)
H, WS = 4352, 960
s1 = jnp.asarray(rng.uniform(0, 1, (H, WS)).astype(np.float32))
s2 = jnp.asarray(rng.uniform(0, 1, (H, WS)).astype(np.float32))


@jax.jit
def run_strip(a, b):
    out = hs_solve_skewed(a, b, 0.5, IT)
    assert out is not None, "strip outside the skewed class"
    return out


dt = timeit(lambda: run_strip(s1, s2))
gps = H * WS * IT / dt / 1e9
print(f"strip {H}x{WS} i{IT} skewed: {dt*1e3:.2f} ms = {gps:.2f} "
      f"Gpx*sweeps/s", flush=True)
results["strip_gpx_sweeps"] = gps
json.dump(results, open(OUT, "w"))

# leg 2: full 8K banded baseline, same process
H8, W8 = 4352, 7680
f1 = jnp.asarray(rng.uniform(0, 1, (H8, W8)).astype(np.float32))
f2 = jnp.asarray(rng.uniform(0, 1, (H8, W8)).astype(np.float32))
cfg = HSConfig(alpha=0.5, iters=IT, backend="pallas")
dt = timeit(lambda: hs_solve(f1, f2, cfg), n=10)
gps = H8 * W8 * IT / dt / 1e9
print(f"8K i{IT} default route: {dt*1e3:.2f} ms = {gps:.2f} "
      f"Gpx*sweeps/s", flush=True)
results["full8k_gpx_sweeps"] = gps
results["verdict"] = ("strip schedule viable" if
                      results["strip_gpx_sweeps"] >
                      1.1 * gps else "dead end: no-overhead strip rate "
                      "does not clear the banded rate by 10%")
json.dump(results, open(OUT, "w"))
print(results["verdict"], flush=True)
print("DONE", flush=True)
