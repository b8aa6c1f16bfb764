"""Whole-solve fused pipeline (kernels/solve_fused.py) vs the jnp oracle.

Same oracle chain as test_pallas_kernels.py rung 4: interpret-mode kernels
on CPU must reproduce ops/stencils arithmetic to ~1 ulp. The VMEM budget
is shrunk so small test frames take the banded (beyond-VMEM) class the
pipeline targets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import opticalflowhs_tpu.kernels.solve_fused as sf
from opticalflowhs_tpu.ops import stencils

TOL = 2e-6


def _oracle(i1, i2, alpha, n, variant="hs_cube", u0=None, v0=None):
    ex, ey, et = stencils.derivatives(i1, i2, variant)
    invd = 1.0 / (alpha * alpha + ex * ex + ey * ey)
    u = jnp.zeros_like(ex) if u0 is None else u0
    v = jnp.zeros_like(ex) if v0 is None else v0
    for _ in range(n):
        u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
    return u, v


def _frames(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
    )


@pytest.fixture
def small_budget(monkeypatch):
    # band lands around 64 rows; frames below stay banded-class
    import opticalflowhs_tpu.kernels.derivatives as dk
    import opticalflowhs_tpu.kernels.jacobi as jk

    budget = 96 * 128 * 4 * sf._ARRAYS
    monkeypatch.setattr(sf, "_VMEM_BUDGET", budget)
    monkeypatch.setattr(jk, "_VMEM_BUDGET", budget)
    monkeypatch.setattr(dk, "_VMEM_BUDGET", budget)
    return budget


@pytest.mark.parametrize(
    "shape,n",
    [((192, 128), 12), ((200, 120), 12), ((256, 140), 9), ((131, 130), 8)],
)
def test_matches_oracle(shape, n, small_budget):
    i1, i2 = _frames(*shape)
    out = sf.hs_solve_fused(i1, i2, 0.5, n, interpret=True)
    assert out is not None, "fused pipeline should apply to banded-class frames"
    ur, vr = _oracle(i1, i2, 0.5, n)
    assert float(jnp.abs(out[0] - ur).max()) <= TOL
    assert float(jnp.abs(out[1] - vr).max()) <= TOL


def test_warm_start_matches_oracle(small_budget):
    i1, i2 = _frames(160, 133, seed=3)
    rng = np.random.default_rng(9)
    u0 = jnp.asarray(rng.normal(size=i1.shape).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=i1.shape).astype(np.float32))
    out = sf.hs_solve_fused(i1, i2, 0.7, 10, u0=u0, v0=v0, interpret=True)
    assert out is not None
    ur, vr = _oracle(i1, i2, 0.7, 10, u0=u0, v0=v0)
    assert float(jnp.abs(out[0] - ur).max()) <= TOL
    assert float(jnp.abs(out[1] - vr).max()) <= TOL


def test_central_variant(small_budget):
    i1, i2 = _frames(144, 129, seed=5)
    out = sf.hs_solve_fused(i1, i2, 0.5, 8, variant="central", interpret=True)
    assert out is not None
    ur, vr = _oracle(i1, i2, 0.5, 8, variant="central")
    assert float(jnp.abs(out[0] - ur).max()) <= TOL


def test_vmem_class_returns_none():
    i1, i2 = _frames(64, 80)
    assert sf.hs_solve_fused(i1, i2, 0.5, 10, interpret=True) is None


def test_prime_iters_runs_remainder_phase(small_budget):
    # 37 prime: the grid's final block runs the rem < s sweeps in-launch
    i1, i2 = _frames(192, 128)
    out = sf.hs_solve_fused(i1, i2, 0.5, 37, interpret=True)
    assert out is not None
    ur, vr = _oracle(i1, i2, 0.5, 37)
    assert float(jnp.abs(out[0] - ur).max()) <= TOL
    assert float(jnp.abs(out[1] - vr).max()) <= TOL


def test_too_few_iters_returns_none(small_budget):
    i1, i2 = _frames(192, 128)
    assert sf.hs_solve_fused(i1, i2, 0.5, 6, interpret=True) is None


def test_geometry_invariants(small_budget):
    for h, w, n in [(192, 128, 100), (1088, 1920, 100), (2176, 3840, 100),
                    (200, 130, 20), (4352, 7680, 50), (256, 140, 37)]:
        wp = ((w + 127) // 128) * 128
        geom = sf.pick_geometry(h, wp, n, jnp.float32, sf._MAX_S)
        if geom is None:
            continue
        s, rem, sigma, band, hp = geom
        assert rem == n % s and rem < s
        assert band % sigma == 0
        assert hp % band == 0 and hp >= h
        assert sigma >= s


def test_solver_routing(small_budget, monkeypatch):
    """hs_solve routes through the fused pipeline when HSFLOW_FUSED_SOLVE=1
    and matches the jnp backend (unique shape so the jit cache entry is
    not shared with other tests)."""
    from opticalflowhs_tpu.config import HSConfig
    from opticalflowhs_tpu.solver import hs_solve

    monkeypatch.setenv("HSFLOW_FUSED_SOLVE", "1")
    i1, i2 = _frames(176, 131, seed=11)
    fp = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=10, backend="pallas"))
    fj = hs_solve(i1, i2, HSConfig(alpha=0.5, iters=10, backend="jnp"))
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL


def test_fused_auto_default(monkeypatch):
    """auto (default) routes single-frame deep schedules only; "0"/"1"
    force. Thresholds per the hardware A/B (tools/hw_solve_fused_ab.py)."""
    from opticalflowhs_tpu.solver import fused_solve_enabled

    monkeypatch.delenv("HSFLOW_FUSED_SOLVE", raising=False)
    assert fused_solve_enabled(100)
    assert fused_solve_enabled(64)
    assert not fused_solve_enabled(20)
    assert not fused_solve_enabled(100, batched=True)
    monkeypatch.setenv("HSFLOW_FUSED_SOLVE", "0")
    assert not fused_solve_enabled(100)
    monkeypatch.setenv("HSFLOW_FUSED_SOLVE", "1")
    assert fused_solve_enabled(20)
    assert fused_solve_enabled(100, batched=True)


def test_batched_matches_oracle(small_budget, monkeypatch):
    import opticalflowhs_tpu.kernels.jacobi as jk

    # shrink the stacked-VMEM threshold so small test frames are
    # "HD-class" for the batched routing
    monkeypatch.setattr(jk, "_BATCH_IMG_BYTES", 1)
    rng = np.random.default_rng(13)
    b, h, w = 3, 160, 131
    i1 = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    out = sf.hs_solve_fused_batched(i1, i2, 0.5, 12, interpret=True)
    assert out is not None
    for k in range(b):
        ur, vr = _oracle(i1[k], i2[k], 0.5, 12)
        assert float(jnp.abs(out[0][k] - ur).max()) <= TOL
        assert float(jnp.abs(out[1][k] - vr).max()) <= TOL


def test_batched_grad_matches_jnp(small_budget, monkeypatch):
    import opticalflowhs_tpu.kernels.jacobi as jk

    monkeypatch.setattr(jk, "_BATCH_IMG_BYTES", 1)
    rng = np.random.default_rng(17)
    b, h, w = 2, 144, 128
    i1 = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))

    def loss_fused(a, c):
        u, v = sf.hs_solve_fused_batched(a, c, 0.5, 8, interpret=True)
        return jnp.sum(u * u + v * v)

    def loss_jnp(a, c):
        u, v = jax.vmap(lambda x, y: _oracle(x, y, 0.5, 8))(a, c)
        return jnp.sum(u * u + v * v)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(i1, i2)
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(i1, i2)
    for a, c in zip(g1, g2):
        assert float(jnp.abs(a - c).max()) <= 1e-4


def test_grad_matches_jnp_twin(small_budget):
    i1, i2 = _frames(160, 128, seed=7)

    def loss_fused(a, b):
        u, v = sf.hs_solve_fused(a, b, 0.5, 8, interpret=True)
        return jnp.sum(u * u + v * v)

    def loss_jnp(a, b):
        u, v = _oracle(a, b, 0.5, 8)
        return jnp.sum(u * u + v * v)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(i1, i2)
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(i1, i2)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) <= 1e-4
