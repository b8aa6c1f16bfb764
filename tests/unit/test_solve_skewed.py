"""u/v-resident time-skewed whole-solve kernel (kernels/solve_skewed.py)
vs the jnp oracle — the same chain as test_solve_resident.py (SURVEY.md §4
rung 4). The schedule's novel surface is the in-place update with pencil
rows: band b+1 must read band b's PRE-update boundary rows, across blocks,
remainders, and warm starts. Tests drive _solve_zero_ad/_solve_warm_ad
with hand-built small geometries (the production class starts at ~2.6 Mpx,
far too large for interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import opticalflowhs_tpu.kernels.solve_skewed as sk
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


def _geom(h, s, n, nb):
    """Hand-built (s, rem, sigma, band, hp) with sigma | band, hp >= h."""
    sigma = ((s + 7) // 8) * 8
    band = max(sigma, ((-(-h // nb)) + sigma - 1) // sigma * sigma)
    hp = band * nb
    assert hp >= h, (hp, h)
    return (s, n % s, sigma, band, hp)


@pytest.mark.parametrize("nb", [1, 2, 3])
@pytest.mark.parametrize(
    "shape,s,n",
    [
        ((48, 128), 3, 7),    # aligned width; rem = 1
        ((40, 130), 4, 8),    # bottom + right pad; rem = 0
        ((53, 120), 5, 12),   # odd height; rem = 2
        ((48, 128), 2, 2),    # single full block
    ],
)
def test_matches_oracle(shape, s, n, nb):
    i1, i2 = _frames(*shape)
    geom = _geom(shape[0], s, n, nb)
    u, v = sk._solve_zero_ad(i1, i2, 0.5, n, "hs_cube", geom, True)
    ur, vr = _oracle(i1, i2, 0.5, n)
    assert float(jnp.abs(u - ur).max()) <= TOL, (shape, s, n, nb)
    assert float(jnp.abs(v - vr).max()) <= TOL, (shape, s, n, nb)


def test_central_variant():
    i1, i2 = _frames(48, 120, seed=4)
    geom = _geom(48, 3, 6, 2)
    u, v = sk._solve_zero_ad(i1, i2, 0.5, 6, "central", geom, True)
    ur, vr = _oracle(i1, i2, 0.5, 6, variant="central")
    assert float(jnp.abs(u - ur).max()) <= TOL
    assert float(jnp.abs(v - vr).max()) <= TOL


def test_warm_start():
    i1, i2 = _frames(48, 128, seed=1)
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    v0 = jnp.asarray(rng.normal(0, 0.5, i1.shape).astype(np.float32))
    for n in (5, 6):
        geom = _geom(48, 3, n, 2)
        u, v = sk._solve_warm_ad(i1, i2, u0, v0, 0.5, n, "hs_cube", geom,
                                 True)
        ur, vr = _oracle(i1, i2, 0.5, n, u0=u0, v0=v0)
        assert float(jnp.abs(u - ur).max()) <= TOL, n
        assert float(jnp.abs(v - vr).max()) <= TOL, n


def test_gradients_match_jnp_twin():
    i1, i2 = _frames(48, 128, seed=2)
    geom = _geom(48, 3, 4, 2)

    def loss_kernel(a, b):
        u, v = sk._solve_zero_ad(a, b, 0.5, 4, "hs_cube", geom, True)
        return jnp.sum(u * u) + jnp.sum(v)

    def loss_jnp(a, b):
        u, v = _oracle(a, b, 0.5, 4)
        return jnp.sum(u * u) + jnp.sum(v)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(i1, i2)
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(i1, i2)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) <= 1e-4


def test_class_boundaries():
    # resident class (small frame): the skewed schedule defers
    assert sk.applicable(jnp.zeros((192, 128), jnp.float32), 10) is None
    # 1440p: below the measured _MIN_PX crossover, fused keeps the class
    assert sk.applicable(jnp.zeros((1440, 2560), jnp.float32), 100) is None
    # 4K: beyond 8-array residency, inside 2-array residency
    assert sk.applicable(jnp.zeros((2176, 3840), jnp.float32), 100) is not None
    # 8K: u/v alone outgrow VMEM
    assert sk.applicable(jnp.zeros((4352, 7680), jnp.float32), 50) is None
    # batched input
    assert sk.applicable(jnp.zeros((2, 2176, 3840), jnp.float32), 100) is None


def test_geometry_constraints():
    geom = sk.pick_geometry(2176, 3840, 100, jnp.float32, sk._MAX_S)
    assert geom is not None
    s, rem, sigma, band, hp = geom
    assert sigma % 8 == 0 and band % sigma == 0 and hp % band == 0
    assert hp >= 2176 and rem == 100 % s


def test_solver_routes_skewed(monkeypatch):
    # With the resident class emptied and the skewed gate forced on,
    # hs_solve routes a small frame through the skewed kernel and matches
    # the jnp backend.
    import opticalflowhs_tpu.kernels.solve_resident as sr
    import opticalflowhs_tpu.solver as solver
    from opticalflowhs_tpu.config import HSConfig

    monkeypatch.setenv("HSFLOW_SKEWED_SOLVE", "1")
    monkeypatch.setenv("HSFLOW_RESIDENT_SOLVE", "0")
    monkeypatch.setenv("HSFLOW_FUSED_SOLVE", "0")
    monkeypatch.setattr(sk, "_MIN_PX", 0)
    monkeypatch.setattr(sr, "pick_geometry", lambda *a, **k: None)
    called = {}
    orig = sk.pick_geometry

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(sk, "pick_geometry", spy)
    i1, i2 = _frames(200, 130, seed=5)
    fp = solver.hs_solve(i1, i2, HSConfig(alpha=0.5, iters=9,
                                          backend="pallas"))
    fj = solver.hs_solve(i1, i2, HSConfig(alpha=0.5, iters=9,
                                          backend="jnp"))
    assert called.get("yes")
    assert float(jnp.abs(fp.u - fj.u).max()) <= TOL
    assert float(jnp.abs(fp.v - fj.v).max()) <= TOL


def test_batched_matches_singles():
    i1b, i2b = [], []
    for b in range(3):
        a, c = _frames(44, 130, seed=20 + b)
        i1b.append(a)
        i2b.append(c)
    i1 = jnp.stack(i1b)
    i2 = jnp.stack(i2b)
    geom = _geom(44, 3, 7, 2)
    u, v = sk._solve_batched_ad(i1, i2, 0.5, 7, "hs_cube", geom, True)
    for b in range(3):
        ur, vr = _oracle(i1[b], i2[b], 0.5, 7)
        assert float(jnp.abs(u[b] - ur).max()) <= TOL, b
        assert float(jnp.abs(v[b] - vr).max()) <= TOL, b


def test_batched_gates():
    # sub-class frames and 2-D input stay off the batched skewed path
    assert sk.hs_solve_skewed_batched(
        jnp.zeros((2, 64, 128)), jnp.zeros((2, 64, 128)), 0.5, 8,
        interpret=True) is None
    assert sk.hs_solve_skewed_batched(
        jnp.zeros((64, 128)), jnp.zeros((64, 128)), 0.5, 8,
        interpret=True) is None
