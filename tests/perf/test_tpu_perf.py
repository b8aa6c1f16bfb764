"""Perf smoke floors on real TPU (SURVEY.md §4 tests/perf; HSFLOW_TEST_TPU=1).

Not a benchmark — a regression tripwire: sweep throughput must stay above a
floor well below the tuned number so infra noise doesn't flake the suite.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.solver import hs_solve

pytestmark = pytest.mark.tpu


def _throughput(h, w, iters, backend, repeats=5):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    cfg = HSConfig(alpha=0.5, iters=iters, backend=backend)
    f = hs_solve(i1, i2, cfg)
    float(jnp.sum(f.u))  # force deferred compile + full sync (axon quirk)
    t0 = time.perf_counter()
    for _ in range(repeats):
        f = hs_solve(i1, i2, cfg)
    jax.block_until_ready(f)
    dt = (time.perf_counter() - t0) / repeats
    return h * w * iters / dt / 1e9


def test_pallas_sweep_floor():
    gpx = _throughput(1024, 1280, 100, "pallas")
    # measured 25-36 Gpx*sweeps/s across sessions (±20% tunnel variance)
    assert gpx > 12.0, f"pallas sweep throughput regressed: {gpx:.1f} Gpx*sweeps/s"


def test_pallas_beats_jnp_at_mpx_scale():
    gp = _throughput(1024, 1280, 100, "pallas")
    gj = _throughput(1024, 1280, 100, "jnp")
    assert gp > 0.9 * gj, f"pallas {gp:.1f} should not trail jnp {gj:.1f} by >10%"
