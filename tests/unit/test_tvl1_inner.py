"""VMEM-resident fused TV-L1 inner loop (kernels/tvl1_inner.py) vs the jnp
oracle loop — same chain as test_solve_resident.py (SURVEY.md §4 rung 4):
the interpret-mode kernel on CPU must reproduce the tvl1.py fori_loop body
bitwise across band counts, pad geometries, and warm flow states."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import opticalflowhs_tpu.kernels.tvl1_inner as tvk
import opticalflowhs_tpu.tvl1 as tv
from opticalflowhs_tpu.config import PyramidConfig, TVL1Config

TOL = 2e-6


def _fields(shape, seed=0):
    rng = np.random.default_rng(seed)
    i1 = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    u1 = jnp.asarray(rng.normal(0, 0.3, shape).astype(np.float32))
    u2 = jnp.asarray(rng.normal(0, 0.3, shape).astype(np.float32))
    return i1, i2, u1, u2


@pytest.mark.parametrize("nb", [1, 2, 3])
@pytest.mark.parametrize(
    "shape,iters",
    [
        ((96, 128), 9),     # aligned both dims
        ((131, 130), 7),    # odd everything (bottom + right pad)
        ((200, 120), 11),   # right pad only
        ((96, 256), 1),     # single alternation
    ],
)
def test_warp_iteration_matches_oracle(shape, iters, nb, monkeypatch):
    monkeypatch.setattr(tvk, "_FORCE_NB", nb)
    i1, i2, u1, u2 = _fields(shape)
    cfg_k = TVL1Config(iters=iters, median=False, backend="pallas")
    cfg_j = TVL1Config(iters=iters, median=False, backend="jnp")
    ok = tv.tvl1_warp_iteration(i1, i2, u1, u2, cfg_k, kernel_ok=True)
    oj = tv.tvl1_warp_iteration(i1, i2, u1, u2, cfg_j, kernel_ok=True)
    for a, b in zip(ok, oj):
        assert float(jnp.abs(a - b).max()) <= TOL


def test_full_solve_matches_jnp_backend():
    # The kernel == loop invariant is bitwise PER WARP ITERATION (above,
    # op-by-op execution). Inside the one whole-pyramid jit, XLA's fusion/
    # FMA-contraction choices differ between the two graph shapes, and
    # TV-L1's warp GATHER amplifies a ULP flow difference into an O(1)
    # pixel-index flip (unlike contracting HS Jacobi) — so the full-solve
    # gate is trajectory-level: same EPE on a smooth synthetic problem.
    from opticalflowhs_tpu.data.synthetic import translation_pair
    from opticalflowhs_tpu.metrics import epe, interior

    i1, i2, gt = translation_pair(128, 192, 1.3, -0.8, key=3)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    pyr = PyramidConfig(levels=2, iters_per_level=())
    gtc = interior(gt, 8)
    es = {}
    for backend in ("pallas", "jnp"):
        f = tv.tvl1_solve(i1, i2, TVL1Config(iters=40, backend=backend),
                          pyr)
        fl = np.stack([np.asarray(f.u), np.asarray(f.v)], -1)
        es[backend] = float(epe(interior(fl, 8), gtc))
    assert es["pallas"] < 0.25, es
    assert abs(es["pallas"] - es["jnp"]) <= 2e-2, es


def test_kernel_routed_on_pallas_backend(monkeypatch):
    calls = {"n": 0}
    orig = tvk.tvl1_inner

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(tvk, "tvl1_inner", spy)
    i1, i2, u1, u2 = _fields((96, 128), seed=1)
    tv.tvl1_warp_iteration(i1, i2, u1, u2,
                           TVL1Config(iters=3, backend="pallas"),
                           kernel_ok=True)
    assert calls["n"] == 1
    # batched/tiled paths never see the kernel (kernel_ok defaults False)
    tv.tvl1_warp_iteration(i1, i2, u1, u2,
                           TVL1Config(iters=3, backend="pallas"))
    assert calls["n"] == 1


def test_not_applicable_cases():
    z = jnp.zeros((64, 128), jnp.float32)
    assert tvk.tvl1_inner(z[None], z[None], z[None], z[None], z[None],
                          z[None], z[None], 4, 0.3, 0.8, 0.045) is None
    assert tvk.pick_geometry(10_000, 10_000, jnp.float32) is None


def test_gradients_match_jnp_twin(monkeypatch):
    monkeypatch.setattr(tvk, "_FORCE_NB", 2)
    i1, i2, u1, u2 = _fields((96, 128), seed=2)
    cfg_k = TVL1Config(iters=4, median=False, backend="pallas")
    cfg_j = TVL1Config(iters=4, median=False, backend="jnp")

    def loss(cfg):
        def f(a, b):
            w1, w2 = tv.tvl1_warp_iteration(a, b, u1, u2, cfg,
                                            kernel_ok=True)
            return jnp.sum(w1 * w1) + jnp.sum(w2)

        return jax.grad(f, argnums=(0, 1))(i1, i2)

    g1 = loss(cfg_k)
    g2 = loss(cfg_j)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) <= 1e-4


@pytest.mark.tpu
def test_tvl1_kernel_exact_on_hardware():
    # real-chip leg: compiled fused inner loop vs the jnp backend at a
    # banded-class shape
    i1, i2, _, _ = _fields((544, 960), seed=9)
    pyr = PyramidConfig(levels=1, iters_per_level=())
    fk = tv.tvl1_solve(i1, i2, TVL1Config(iters=30, warps=2,
                                          backend="pallas"), pyr)
    fj = tv.tvl1_solve(i1, i2, TVL1Config(iters=30, warps=2,
                                          backend="jnp"), pyr)
    assert float(jnp.abs(fk.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fk.v - fj.v).max()) <= TOL
