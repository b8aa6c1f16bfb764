"""Color-plane-compressed SOR kernel (kernels/sor_planes.py) vs the jnp
oracle — bitwise across all four h/w parity combinations (the plane
boundary fixes depend on them), pad geometries, and warm starts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import opticalflowhs_tpu.kernels.sor_planes as sp
from opticalflowhs_tpu.ops import stencils

TOL = 2e-6


def _frames(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
    )


def _oracle(i1, i2, alpha, n, omega, u0=None, v0=None):
    ex, ey, et = stencils.derivatives(i1, i2)
    invd = 1.0 / (alpha * alpha + ex * ex + ey * ey)
    colors = stencils.color_masks(*i1.shape)
    u = jnp.zeros_like(ex) if u0 is None else u0
    v = jnp.zeros_like(ex) if v0 is None else v0
    for _ in range(n):
        u, v = stencils.sor_step(u, v, ex, ey, et, invd, omega, colors)
    return u, v


@pytest.mark.parametrize(
    "shape,n,omega",
    [
        ((192, 128), 7, 1.6),   # even/even
        ((131, 130), 5, 1.3),   # odd/even
        ((96, 255), 6, 1.9),    # even/odd
        ((97, 253), 4, 1.5),    # odd/odd
    ],
)
def test_matches_oracle(shape, n, omega):
    i1, i2 = _frames(*shape)
    out = sp.hs_solve_sor_planes(i1, i2, 0.5, n, omega, interpret=True)
    assert out is not None
    ur, vr = _oracle(i1, i2, 0.5, n, omega)
    assert float(jnp.abs(out[0] - ur).max()) <= TOL
    assert float(jnp.abs(out[1] - vr).max()) <= TOL


def test_warm_start():
    i1, i2 = _frames(96, 130, seed=1)
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.normal(0, 0.4, i1.shape).astype(np.float32))
    v0 = jnp.asarray(rng.normal(0, 0.4, i1.shape).astype(np.float32))
    out = sp.hs_solve_sor_planes(i1, i2, 0.5, 4, 1.7, u0=u0, v0=v0,
                                 interpret=True)
    ur, vr = _oracle(i1, i2, 0.5, 4, 1.7, u0, v0)
    assert float(jnp.abs(out[0] - ur).max()) <= TOL
    assert float(jnp.abs(out[1] - vr).max()) <= TOL


def test_not_applicable_cases():
    i1, i2 = _frames(64, 128)
    assert sp.hs_solve_sor_planes(i1[None], i2[None], 0.5, 4, 1.5,
                                  interpret=True) is None
    assert sp.applicable_shape(10_000, 10_000, jnp.float32) is None


def test_gradients_match_jnp_twin():
    i1, i2 = _frames(96, 128, seed=2)

    def loss_kernel(a, b):
        u, v = sp.hs_solve_sor_planes(a, b, 0.5, 4, 1.5, interpret=True)
        return jnp.sum(u * u) + jnp.sum(v)

    def loss_jnp(a, b):
        u, v = _oracle(a, b, 0.5, 4, 1.5)
        return jnp.sum(u * u) + jnp.sum(v)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(i1, i2)
    g2 = jax.grad(loss_jnp, argnums=(0, 1))(i1, i2)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) <= 1e-4
