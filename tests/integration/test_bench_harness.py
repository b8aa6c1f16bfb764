"""Bench harness smoke tests (N15) on the CPU backend."""

from opticalflowhs_tpu.bench import run_bench, run_scaling_bench
from opticalflowhs_tpu.config import HSConfig, PyramidConfig, RunConfig


def test_run_bench_smoke():
    rc = RunConfig(hs=HSConfig(iters=4, backend="jnp"), pyramid=PyramidConfig(levels=2))
    r = run_bench(rc, shape=(32, 64), repeats=2)
    st = r["sweep_throughput"]
    assert st["gpx_sweeps_per_s"] > 0
    assert 0 < st["fraction_of_roofline"]
    assert r["pyramid"]["fps"] > 0


def test_run_scaling_bench_smoke():
    rc = RunConfig(hs=HSConfig(iters=4, backend="jnp"))
    r = run_scaling_bench(rc, shape=(16, 32), repeats=2)
    assert r["fps_1chip_batched"] > 0
    assert r["n_devices"] == 8
    assert "fps_8chip_batched" in r
    ws = r["weak_scaling"]
    assert ws["efficiency"] > 0
    assert ws["mesh"] == [1, 2, 4]
