"""Test-suite environment setup (SURVEY.md §4).

The suite runs on the CPU backend with 8 virtual devices — the standard JAX
fake-backend trick — so distributed tests can build real 1x8 / 2x4 / 8x1
meshes without a pod. Set HSFLOW_TEST_TPU=1 to run on real TPU hardware
instead (tests marked `tpu` only run there).

This must execute before anything imports jax, which pytest guarantees for a
rootdir conftest.
"""

import os

ON_TPU = os.environ.get("HSFLOW_TEST_TPU", "0") == "1"

if not ON_TPU:
    # The launch environment both pre-sets JAX_PLATFORMS (TPU tunnel) and
    # pre-imports jax at interpreter startup, so plain env vars are too late.
    # Backend initialization is still lazy, so setting XLA_FLAGS plus the
    # jax_platforms config before the first device query does work.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from opticalflowhs_tpu.data.synthetic import synthetic_pair, WarpSpec  # noqa: E402


@pytest.hookimpl(tryfirst=True)
def pytest_cmdline_main(config):
    """Default the CPU suite to 4 xdist workers (round-2 VERDICT weak #2):
    one process accumulates hundreds of XLA CPU compiles x 8 fake devices
    and aborts inside backend_compile at ~86% of the suite; sharding the
    run across worker processes divides that pressure 4x and the full
    suite finishes in one command. Must run BEFORE xdist's own
    (tryfirst) pytest_cmdline_main, which derives its worker transports
    from numprocesses — a conftest hook registers later and is therefore
    called first. Explicit -n/-n0 still wins; TPU runs stay serial (one
    chip, serial remote-compile helper)."""
    if ON_TPU:
        return
    if os.environ.get("PYTEST_XDIST_WORKER"):
        # Workers re-invoke pytest_cmdline_main after xdist resets
        # numprocesses/dist (xdist/remote.py setup_config); re-defaulting
        # here would turn every worker into a controller and hang the run.
        return
    n = getattr(config.option, "numprocesses", None)
    if n is None and not getattr(config.option, "collectonly", False):
        config.option.numprocesses = 4


def pytest_collection_modifyitems(config, items):
    if ON_TPU:
        return
    skip_tpu = pytest.mark.skip(reason="requires real TPU (set HSFLOW_TEST_TPU=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


# -- memory-map guard (root cause of the round-2 single-process abort) --------
#
# Every XLA:CPU-compiled executable mmaps its LLVM JIT code sections, and the
# jit caches keep executables alive for the whole process. One process
# running the full suite on the 8-fake-device mesh accumulates mmaps toward
# the kernel's vm.max_map_count ceiling (65530 default); once mmap returns
# ENOMEM, LLVM hard-aborts ("Unable to allocate section memory!" — measured:
# ~28k maps two minutes into a -n0 run and climbing). It is JIT-code-section
# exhaustion in XLA:CPU, not a leak in this package or libhsio (map counts
# were flat over hundreds of small compiles; only the per-executable
# sections accumulate). Mitigations: xdist-4 divides the pressure per
# worker (the default, below), and this guard makes single-process -n0 runs
# finish by dropping the jit caches — freeing the executables and their
# sections — whenever the map count crosses a safety threshold.

_MAP_GUARD_LIMIT = int(os.environ.get("HSFLOW_MAP_GUARD", "45000"))


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as fh:
            return sum(1 for _ in fh)
    except OSError:  # non-Linux: no /proc, and no map ceiling this low
        return 0


@pytest.hookimpl(trylast=True)
def pytest_runtest_teardown(item):
    if ON_TPU or _MAP_GUARD_LIMIT <= 0:
        return
    if _map_count() > _MAP_GUARD_LIMIT:
        jax.clear_caches()


@pytest.fixture(scope="session")
def n_devices() -> int:
    return jax.device_count()


@pytest.fixture(scope="session")
def small_translation_pair():
    """64x80 texture translated by (1, 0.5) px with analytic GT."""
    return synthetic_pair(64, 80, WarpSpec.translation(1.0, 0.5), key=7)


@pytest.fixture(scope="session")
def tiny_images():
    """Deterministic 8x8 float images for exact stencil-arithmetic checks."""
    rng = np.random.default_rng(0)
    i1 = rng.uniform(0.0, 1.0, (8, 8)).astype(np.float32)
    i2 = rng.uniform(0.0, 1.0, (8, 8)).astype(np.float32)
    return i1, i2
