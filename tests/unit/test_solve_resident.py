"""VMEM-resident whole-solve kernel (kernels/solve_resident.py) vs the jnp
oracle — same chain as test_solve_fused.py (SURVEY.md §4 rung 4): the
interpret-mode kernel on CPU must reproduce ops/stencils arithmetic to
~1 ulp, across band counts, pad geometries, sweep parities, and warm
starts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import opticalflowhs_tpu.kernels.solve_resident as sr
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


@pytest.mark.parametrize("nb", [1, 2, 3])
@pytest.mark.parametrize(
    "shape,n",
    [
        ((192, 128), 11),   # aligned both dims
        ((200, 120), 12),   # bottom + right pad
        ((131, 130), 8),    # odd everything
        ((96, 256), 1),     # single sweep (zero-init shortcut only)
        ((96, 256), 2),     # shortcut + one alternation
    ],
)
def test_matches_oracle(shape, n, nb, monkeypatch):
    monkeypatch.setattr(sr, "_FORCE_NB", nb)
    i1, i2 = _frames(*shape)
    out = sr.hs_solve_resident(i1, i2, 0.5, n, interpret=True)
    assert out is not None
    geom = sr.pick_geometry(*shape, jnp.float32)
    assert geom[0] == nb
    ur, vr = _oracle(i1, i2, 0.5, n)
    assert float(jnp.abs(out[0] - ur).max()) <= TOL
    assert float(jnp.abs(out[1] - vr).max()) <= TOL


@pytest.mark.parametrize("s_blk", [1, 3, 16])
def test_sweep_parities_and_block_depths(monkeypatch, s_blk):
    monkeypatch.setattr(sr, "_FORCE_NB", 2)
    monkeypatch.setattr(sr, "_BLOCK_S", s_blk)
    # even/odd totals, full/tail block mixes, and fori-pair vs static
    # leftovers all land in the output refs through different ping-pong
    # parities — every combination must be exact
    i1, i2 = _frames(160, 130, seed=3)
    for n in (4, 5, 6, 7, 16, 17, 33):
        out = sr.hs_solve_resident(i1, i2, 0.3, n, interpret=True)
        ur, vr = _oracle(i1, i2, 0.3, n)
        assert float(jnp.abs(out[0] - ur).max()) <= TOL, (s_blk, n)
        assert float(jnp.abs(out[1] - vr).max()) <= TOL, (s_blk, n)


def test_warm_start(monkeypatch):
    monkeypatch.setattr(sr, "_FORCE_NB", 2)
    i1, i2 = _frames(192, 128, seed=1)
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    v0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    for n in (3, 4):
        out = sr.hs_solve_resident(i1, i2, 0.5, n, u0=u0, v0=v0,
                                   interpret=True)
        ur, vr = _oracle(i1, i2, 0.5, n, u0=u0, v0=v0)
        assert float(jnp.abs(out[0] - ur).max()) <= TOL, n
        assert float(jnp.abs(out[1] - vr).max()) <= TOL, n


@pytest.mark.parametrize("nb", [1, 2])
def test_batched_matches_singles(nb, monkeypatch):
    monkeypatch.setattr(sr, "_FORCE_NB", nb)
    # drop the stacked-class gate so small test frames take the batched
    # resident path
    import opticalflowhs_tpu.kernels.jacobi as jk

    monkeypatch.setattr(jk, "_BATCH_IMG_BYTES", 0)
    rng = np.random.default_rng(11)
    i1 = jnp.asarray(rng.uniform(0, 1, (3, 96, 130)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (3, 96, 130)).astype(np.float32))
    out = sr.hs_solve_resident_batched(i1, i2, 0.5, 7, interpret=True)
    assert out is not None
    for b in range(3):
        ur, vr = _oracle(i1[b], i2[b], 0.5, 7)
        assert float(jnp.abs(out[0][b] - ur).max()) <= TOL, b
        assert float(jnp.abs(out[1][b] - vr).max()) <= TOL, b


def test_batched_gates():
    rng = np.random.default_rng(1)
    i1 = jnp.asarray(rng.uniform(0, 1, (2, 64, 128)).astype(np.float32))
    # sub-HD stacked-VMEM class: stays on the stacked kernel
    assert sr.hs_solve_resident_batched(i1, i1, 0.5, 4,
                                        interpret=True) is None


def test_not_applicable_cases():
    i1, i2 = _frames(64, 128)
    # central variant: not plumbed through the banded deriv window
    assert sr.hs_solve_resident(i1, i2, 0.5, 4, variant="central",
                                interpret=True) is None
    # batched input
    assert sr.hs_solve_resident(i1[None], i2[None], 0.5, 4,
                                interpret=True) is None
    # beyond the residency class
    assert sr.pick_geometry(10_000, 10_000, jnp.float32) is None


def test_gradients_match_jnp_twin(monkeypatch):
    monkeypatch.setattr(sr, "_FORCE_NB", 2)
    i1, i2 = _frames(96, 128, seed=2)

    def loss_kernel(a, b):
        u, v = sr.hs_solve_resident(a, b, 0.5, 4, interpret=True)
        return jnp.sum(u * u) + jnp.sum(v)

    def loss_jnp(a, b):
        ex, ey, et = stencils.derivatives(a, b)
        invd = 1.0 / (0.25 + ex * ex + ey * ey)
        u = jnp.zeros_like(ex)
        v = jnp.zeros_like(ex)
        for _ in range(4):
            u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
        return jnp.sum(u * u) + jnp.sum(v)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(i1, i2)
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(i1, i2)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) <= 1e-4


@pytest.mark.tpu
def test_resident_exact_on_hardware():
    # real-chip leg of the oracle chain: the compiled (non-interpret)
    # resident kernel at a banded-class shape vs the jnp backend
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    i1, i2 = _frames(1088, 1920, seed=9)
    fp = solver.hs_solve(i1, i2, HSConfig(alpha=0.5, iters=40,
                                          backend="pallas"))
    fj = solver.hs_solve(i1, i2, HSConfig(alpha=0.5, iters=40,
                                          backend="jnp"))
    assert float(jnp.abs(fp.u - fj.u).max()) == 0.0
    assert float(jnp.abs(fp.v - fj.v).max()) == 0.0


def test_solver_routes_resident(monkeypatch):
    # solver.hs_solve picks the resident path on the pallas backend when
    # applicable, and it matches the jnp backend bitwise-ish
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    monkeypatch.setenv("HSFLOW_RESIDENT_SOLVE", "1")
    i1, i2 = _frames(192, 128, seed=5)
    cfg_p = HSConfig(alpha=0.5, iters=8, backend="pallas")
    cfg_j = HSConfig(alpha=0.5, iters=8, backend="jnp")
    fp = solver.hs_solve(i1, i2, cfg_p)
    fj = solver.hs_solve(i1, i2, cfg_j)
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL


def test_tol_solve_rides_resident_blocks(monkeypatch):
    # round 4: cfg.tol > 0 runs sweeps_until with warm-started resident
    # whole-solve launches as check blocks; must equal the jnp tol path
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    monkeypatch.setattr(sr, "_FORCE_NB", 2)
    monkeypatch.setenv("HSFLOW_RESIDENT_SOLVE", "1")
    calls = {"n": 0}
    orig = sr.hs_solve_resident

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(sr, "hs_solve_resident", spy)
    i1, i2 = _frames(192, 128, seed=8)
    cfg_p = HSConfig(alpha=0.5, iters=48, tol=1e-4, block_sweeps=8,
                     backend="pallas")
    cfg_j = HSConfig(alpha=0.5, iters=48, tol=1e-4, block_sweeps=8,
                     backend="jnp")
    fp = solver.hs_solve(i1, i2, cfg_p)
    fj = solver.hs_solve(i1, i2, cfg_j)
    assert calls["n"] >= 1  # the resident block runner was traced
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL


def test_tol_resident_gate_uses_cast_dtype():
    # regression (round-4 review): bf16 inputs inside the bf16 residency
    # class but outside the fp32 class must NOT take the resident-blocked
    # tol route when cfg.dtype is float32 — the gate checks the CAST
    # array. Trace-only (eval_shape); the bug raised TypeError at trace.
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    h, w = 2036, 1920
    assert sr.pick_geometry(h, w, jnp.bfloat16) is not None
    assert sr.pick_geometry(h, w, jnp.float32) is None
    i1 = jax.ShapeDtypeStruct((h, w), jnp.bfloat16)
    cfg = HSConfig(alpha=0.5, iters=64, tol=1e-3, backend="pallas")
    out = jax.eval_shape(
        lambda a, b: solver.solve_level(a, b, cfg, cfg.iters), i1, i1
    )
    assert out.u.shape == (h, w)


# -- VMEM-resident 4-color SOR whole solve (round 5) ---------------------------


def _oracle_sor(i1, i2, alpha, n, omega, u0=None, v0=None):
    ex, ey, et = stencils.derivatives(i1, i2)
    invd = 1.0 / (alpha * alpha + ex * ex + ey * ey)
    colors = stencils.color_masks(*i1.shape)
    u = jnp.zeros_like(ex) if u0 is None else u0
    v = jnp.zeros_like(ex) if v0 is None else v0
    for _ in range(n):
        u, v = stencils.sor_step(u, v, ex, ey, et, invd, omega, colors)
    return u, v


@pytest.mark.parametrize("nb", [1, 2, 3])
@pytest.mark.parametrize(
    "shape,n,omega",
    [
        ((192, 128), 7, 1.6),   # aligned both dims
        ((200, 120), 8, 1.9),   # bottom + right pad
        ((131, 130), 5, 1.3),   # odd everything (odd H exercises parity
                                #  of the global color grids across bands)
        ((96, 256), 1, 1.5),    # single sweep
    ],
)
def test_sor_matches_oracle(shape, n, omega, nb, monkeypatch):
    monkeypatch.setattr(sr, "_FORCE_NB", nb)
    i1, i2 = _frames(*shape)
    out = sr.hs_solve_resident_sor(i1, i2, 0.5, n, omega, interpret=True)
    assert out is not None
    ur, vr = _oracle_sor(i1, i2, 0.5, n, omega)
    assert float(jnp.abs(out[0] - ur).max()) <= TOL
    assert float(jnp.abs(out[1] - vr).max()) <= TOL


def test_sor_warm_start(monkeypatch):
    monkeypatch.setattr(sr, "_FORCE_NB", 2)
    i1, i2 = _frames(192, 128, seed=1)
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    v0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    for n in (3, 4):
        out = sr.hs_solve_resident_sor(i1, i2, 0.5, n, 1.7, u0=u0, v0=v0,
                                       interpret=True)
        ur, vr = _oracle_sor(i1, i2, 0.5, n, 1.7, u0=u0, v0=v0)
        assert float(jnp.abs(out[0] - ur).max()) <= TOL, n
        assert float(jnp.abs(out[1] - vr).max()) <= TOL, n


def test_sor_not_applicable_cases():
    i1, i2 = _frames(64, 128)
    assert sr.hs_solve_resident_sor(i1, i2, 0.5, 4, 1.5, variant="central",
                                    interpret=True) is None
    assert sr.hs_solve_resident_sor(i1[None], i2[None], 0.5, 4, 1.5,
                                    interpret=True) is None
    assert sr.pick_geometry(10_000, 10_000, jnp.float32, stages=4) is None


def test_sor_gradients_match_jnp_twin(monkeypatch):
    monkeypatch.setattr(sr, "_FORCE_NB", 2)
    i1, i2 = _frames(96, 128, seed=2)

    def loss_kernel(a, b):
        u, v = sr.hs_solve_resident_sor(a, b, 0.5, 4, 1.5, interpret=True)
        return jnp.sum(u * u) + jnp.sum(v)

    def loss_jnp(a, b):
        u, v = _oracle_sor(a, b, 0.5, 4, 1.5)
        return jnp.sum(u * u) + jnp.sum(v)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(i1, i2)
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(i1, i2)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) <= 1e-4


def test_solver_routes_resident_sor(monkeypatch):
    # hs_solve(solver="sor") on the pallas backend rides the resident SOR
    # whole-solve kernel and matches the jnp backend to kernel tolerance
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    monkeypatch.setenv("HSFLOW_RESIDENT_SOLVE", "1")
    calls = {"n": 0}
    orig = sr.hs_solve_resident_sor

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(sr, "hs_solve_resident_sor", spy)
    i1, i2 = _frames(192, 128, seed=5)
    cfg_p = HSConfig(alpha=0.5, iters=8, solver="sor", omega=1.6,
                     backend="pallas")
    cfg_j = HSConfig(alpha=0.5, iters=8, solver="sor", omega=1.6,
                     backend="jnp")
    fp = solver.hs_solve(i1, i2, cfg_p)
    assert calls["n"] == 1
    fj = solver.hs_solve(i1, i2, cfg_j)
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL


def test_sor_tol_rides_resident_blocks(monkeypatch):
    # cfg.tol > 0 with solver="sor" runs sweeps_until with warm-started
    # resident SOR launches as check blocks; must equal the jnp tol path
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    monkeypatch.setattr(sr, "_FORCE_NB", 2)
    monkeypatch.setenv("HSFLOW_RESIDENT_SOLVE", "1")
    calls = {"n": 0}
    orig = sr.hs_solve_resident_sor

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(sr, "hs_solve_resident_sor", spy)
    i1, i2 = _frames(192, 128, seed=8)
    cfg_p = HSConfig(alpha=0.5, iters=48, tol=1e-4, block_sweeps=8,
                     solver="sor", omega=1.6, backend="pallas")
    cfg_j = HSConfig(alpha=0.5, iters=48, tol=1e-4, block_sweeps=8,
                     solver="sor", omega=1.6, backend="jnp")
    fp = solver.hs_solve(i1, i2, cfg_p)
    assert calls["n"] >= 1
    fj = solver.hs_solve(i1, i2, cfg_j)
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL


@pytest.mark.tpu
def test_sor_resident_exact_on_hardware():
    # real-chip leg: compiled resident SOR at 1080p vs the jnp backend
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    i1, i2 = _frames(1088, 1920, seed=9)
    fp = solver.hs_solve(i1, i2, HSConfig(alpha=0.5, iters=20, solver="sor",
                                          omega=1.7, backend="pallas"))
    fj = solver.hs_solve(i1, i2, HSConfig(alpha=0.5, iters=20, solver="sor",
                                          omega=1.7, backend="jnp"))
    assert float(jnp.abs(fp.u - fj.u).max()) == 0.0
    assert float(jnp.abs(fp.v - fj.v).max()) == 0.0
