"""Batched/DP solve (SURVEY.md §4: batched vmap == loop of singles; §2b P1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from opticalflowhs_tpu.batch import hs_solve_batched, video_pairs
from opticalflowhs_tpu.config import HSConfig, PyramidConfig
from opticalflowhs_tpu.data.synthetic import synthetic_sequence
from opticalflowhs_tpu.solver import hs_solve


@pytest.fixture(scope="module")
def video():
    frames, gt = synthetic_sequence(5, 40, 48, tx=1.0, ty=0.0, key=17)
    return jnp.asarray(frames), gt


def test_batched_equals_loop_of_singles(video):
    frames, _ = video
    i1, i2 = video_pairs(frames)
    cfg = HSConfig(alpha=0.5, iters=60, backend="jnp")
    batched = hs_solve_batched(i1, i2, cfg)
    for k in range(i1.shape[0]):
        single = hs_solve(i1[k], i2[k], cfg)
        np.testing.assert_allclose(np.asarray(batched.u[k]), np.asarray(single.u), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched.v[k]), np.asarray(single.v), atol=1e-5)


def test_batched_pyramid(video):
    frames, _ = video
    i1, i2 = video_pairs(frames)
    cfg = HSConfig(alpha=0.5, iters=30, backend="jnp")
    flow = hs_solve_batched(i1, i2, cfg, pyr=PyramidConfig(levels=2))
    assert flow.u.shape == i1.shape


def test_batched_with_mesh_sharding(video):
    frames, _ = video
    i1, i2 = video_pairs(frames)  # B=4
    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("batch",))
    cfg = HSConfig(alpha=0.5, iters=60, backend="jnp")
    sharded = hs_solve_batched(i1, i2, cfg, mesh=mesh)
    plain = hs_solve_batched(i1, i2, cfg)
    np.testing.assert_allclose(np.asarray(sharded.u), np.asarray(plain.u), atol=1e-5)


def test_video_pairs_shapes(video):
    frames, _ = video
    i1, i2 = video_pairs(frames)
    assert i1.shape == i2.shape == (4, 40, 48)
    np.testing.assert_array_equal(np.asarray(i1[1]), np.asarray(i2[0]))


def test_video_pairs_rejects_2d():
    with pytest.raises(ValueError):
        video_pairs(jnp.zeros((8, 8)))


def test_batched_rejects_2d():
    with pytest.raises(ValueError):
        hs_solve_batched(jnp.zeros((8, 8)), jnp.zeros((8, 8)))


def test_batched_pyramid_pallas_matches_jnp():
    """Batched pyramid on the pallas backend (vmapped pallas_call chain,
    incl. the fused derivative kernel under vmap) == jnp backend."""
    import numpy as np
    import jax.numpy as jnp
    from opticalflowhs_tpu.batch import hs_solve_batched
    from opticalflowhs_tpu.config import HSConfig, PyramidConfig

    rng = np.random.default_rng(9)
    i1 = jnp.asarray(rng.uniform(0, 1, (2, 32, 48)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (2, 32, 48)).astype(np.float32))
    pyr = PyramidConfig(levels=2)
    fp = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=8, backend="pallas"), pyr)
    fj = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=8, backend="jnp"), pyr)
    np.testing.assert_allclose(np.asarray(fp.u), np.asarray(fj.u), atol=2e-6)


def test_batched_pyramid_resident_kernel_matches_jnp(monkeypatch):
    """Batched pyramid with the batched RESIDENT whole-solve kernel forced
    on at every level (round 4: level solves ride solve_level_batched) ==
    jnp backend."""
    import numpy as np
    import jax.numpy as jnp
    import opticalflowhs_tpu.kernels.jacobi as jk
    from opticalflowhs_tpu.batch import hs_solve_batched
    from opticalflowhs_tpu.config import HSConfig, PyramidConfig

    monkeypatch.setenv("HSFLOW_RESIDENT_SOLVE", "1")
    monkeypatch.setattr(jk, "_BATCH_IMG_BYTES", 0)  # empty the stacked class
    rng = np.random.default_rng(10)
    i1 = jnp.asarray(rng.uniform(0, 1, (2, 48, 64)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (2, 48, 64)).astype(np.float32))
    pyr = PyramidConfig(levels=2)
    fp = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=6, backend="pallas"), pyr)
    fj = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=6, backend="jnp"), pyr)
    np.testing.assert_allclose(np.asarray(fp.u), np.asarray(fj.u), atol=2e-6)
    np.testing.assert_allclose(np.asarray(fp.v), np.asarray(fj.v), atol=2e-6)
