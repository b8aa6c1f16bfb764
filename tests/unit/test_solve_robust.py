"""VMEM-resident Charbonnier-IRLS whole-solve kernel (kernels/solve_robust.py)
vs the jnp oracle (robust.robust_sweeps) — same chain as
test_solve_resident.py: interpret-mode kernel on CPU reproduces the oracle
across band counts, pad geometries, refreeze cadences (even/odd k =
single-freeze groups vs 2k superblocks), remainders, and warm starts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import opticalflowhs_tpu.kernels.solve_robust as srb
from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.robust import robust_sweeps

TOL = 2e-6


def _frames(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
    )


def _oracle(i1, i2, cfg, u0=None, v0=None):
    ex, ey, et = stencils.derivatives(i1, i2)
    u = jnp.zeros_like(ex) if u0 is None else u0
    v = jnp.zeros_like(ex) if v0 is None else v0
    return robust_sweeps(u, v, ex, ey, et, cfg.iters, cfg)


@pytest.mark.parametrize("nb", [1, 2, 3])
@pytest.mark.parametrize(
    "shape,iters,k",
    [
        ((96, 128), 7, 20),    # k > n: one freeze, static remainder
        ((200, 120), 25, 10),  # even k: fori groups + remainder
        ((131, 130), 13, 5),   # odd k: 2k superblocks + crossing remainder
        ((96, 256), 1, 20),    # single sweep
    ],
)
def test_matches_oracle(shape, iters, k, nb, monkeypatch):
    monkeypatch.setattr(srb, "_FORCE_NB", nb)
    i1, i2 = _frames(*shape)
    cfg = HSConfig(alpha=0.4, iters=iters, solver="robust",
                   robust_update_every=k)
    out = srb.hs_solve_robust_resident(i1, i2, cfg, interpret=True)
    assert out is not None
    uo, vo = _oracle(i1, i2, cfg)
    assert float(jnp.abs(out[0] - uo).max()) <= TOL
    assert float(jnp.abs(out[1] - vo).max()) <= TOL


def test_warm_start(monkeypatch):
    monkeypatch.setattr(srb, "_FORCE_NB", 2)
    i1, i2 = _frames(96, 128, seed=1)
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    v0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    cfg = HSConfig(alpha=0.4, iters=9, solver="robust",
                   robust_update_every=4)
    out = srb.hs_solve_robust_resident(i1, i2, cfg, u0=u0, v0=v0,
                                       interpret=True)
    uo, vo = _oracle(i1, i2, cfg, u0=u0, v0=v0)
    assert float(jnp.abs(out[0] - uo).max()) <= TOL
    assert float(jnp.abs(out[1] - vo).max()) <= TOL


def test_not_applicable_cases():
    i1, i2 = _frames(64, 128)
    cfg = HSConfig(iters=4, solver="robust", deriv_variant="central")
    assert srb.hs_solve_robust_resident(i1, i2, cfg,
                                        interpret=True) is None
    assert srb.pick_geometry(10_000, 10_000, jnp.float32) is None


def test_gradients_match_jnp_twin(monkeypatch):
    monkeypatch.setattr(srb, "_FORCE_NB", 2)
    i1, i2 = _frames(96, 128, seed=2)
    cfg = HSConfig(alpha=0.4, iters=5, solver="robust",
                   robust_update_every=3)

    def loss_kernel(a, b):
        u, v = srb.hs_solve_robust_resident(a, b, cfg, interpret=True)
        return jnp.sum(u * u) + jnp.sum(v)

    def loss_jnp(a, b):
        u, v = _oracle(a, b, cfg)
        return jnp.sum(u * u) + jnp.sum(v)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(i1, i2)
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(i1, i2)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) <= 1e-4


def test_solver_routes_resident_robust(monkeypatch):
    import opticalflowhs_tpu.solver as solver

    monkeypatch.setenv("HSFLOW_RESIDENT_SOLVE", "1")
    calls = {"n": 0}
    orig = srb.hs_solve_robust_resident

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(srb, "hs_solve_robust_resident", spy)
    i1, i2 = _frames(192, 128, seed=5)
    cfg_p = HSConfig(alpha=0.4, iters=8, solver="robust", backend="pallas")
    cfg_j = HSConfig(alpha=0.4, iters=8, solver="robust", backend="jnp")
    fp = solver.hs_solve(i1, i2, cfg_p)
    assert calls["n"] == 1
    fj = solver.hs_solve(i1, i2, cfg_j)
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL


@pytest.mark.tpu
def test_robust_resident_exact_on_hardware():
    import opticalflowhs_tpu.solver as solver

    i1, i2 = _frames(1088, 1920, seed=9)
    cfg = dict(alpha=0.4, iters=20, solver="robust")
    fp = solver.hs_solve(i1, i2, HSConfig(backend="pallas", **cfg))
    fj = solver.hs_solve(i1, i2, HSConfig(backend="jnp", **cfg))
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL
