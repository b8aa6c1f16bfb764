"""Pallas kernel ≡ jnp ops equivalence (SURVEY.md §4 oracle rung 4).

Runs the kernels in Pallas interpret mode on the CPU test backend; the
`tpu`-marked test compiles the real Mosaic kernels on hardware
(HSFLOW_TEST_TPU=1).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.kernels import jacobi as jk
from opticalflowhs_tpu.ops import stencils
from opticalflowhs_tpu.solver import hs_solve, precompute


def _oracle_sweeps(u, v, ex, ey, et, invd, n):
    for _ in range(n):
        u, v = stencils.jacobi_step(u, v, ex, ey, et, invd)
    return u, v


def _problem(h, w, seed=0):
    rng = np.random.default_rng(seed)
    i1 = rng.uniform(0, 1, (h, w)).astype(np.float32)
    i2 = rng.uniform(0, 1, (h, w)).astype(np.float32)
    cfg = HSConfig(alpha=0.7)
    ex, ey, et, invd = precompute(jnp.asarray(i1), jnp.asarray(i2), cfg)
    u = jnp.zeros_like(ex)
    v = jnp.zeros_like(ex)
    return u, v, ex, ey, et, invd


# Shapes chosen to hit: tile-aligned, unaligned rows, unaligned cols, both,
# and smaller-than-one-tile. Kernels mirror the oracle's association order;
# residual diffs are single-ulp FMA-fusion artifacts of separate jits.
@pytest.mark.parametrize("shape", [(64, 128), (37, 51), (64, 80), (129, 257), (8, 128)])
@pytest.mark.parametrize("n", [1, 7, 25])
def test_vmem_path_matches_jnp(shape, n):
    u, v, ex, ey, et, invd = _problem(*shape)
    uo, vo = jk.jacobi_sweeps(u, v, ex, ey, et, invd, n, interpret=True)
    ur, vr = _oracle_sweeps(u, v, ex, ey, et, invd, n)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(ur), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=2e-6)


@pytest.mark.parametrize("shape", [(300, 140), (512, 128), (70, 260)])
@pytest.mark.parametrize("n,s", [(1, 0), (3, 2), (7, 3), (6, 0)])
def test_banded_path_matches_jnp(shape, n, s, monkeypatch):
    # Force the banded path by shrinking the VMEM budget, and use a small
    # band height so several bands exist; s sweeps per halo block
    # (0 = auto), including n % s remainders.
    monkeypatch.setattr(jk, "_VMEM_BUDGET", 1)
    monkeypatch.setattr(jk, "_BAND_ROWS", 64)
    monkeypatch.setattr(jk, "_FOLD_LANES", 0)
    u, v, ex, ey, et, invd = _problem(*shape, seed=3)
    uo, vo = jk.jacobi_sweeps(u, v, ex, ey, et, invd, n, block_sweeps=s, interpret=True)
    ur, vr = _oracle_sweeps(u, v, ex, ey, et, invd, n)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(ur), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=2e-6)


@pytest.mark.parametrize("n,s", [(16, 4), (21, 4), (12, 3)])
def test_fused_banded_megakernel_matches_jnp(n, s, monkeypatch):
    """The single-launch fused schedule (all sweep blocks in one pallas_call,
    u/v ping-ponged between HBM buffers by block parity) must equal the
    oracle for even and odd block counts and with an s-remainder tail."""
    monkeypatch.setattr(jk, "_VMEM_BUDGET", 1)
    monkeypatch.setattr(jk, "_BAND_ROWS", 64)
    monkeypatch.setattr(jk, "_FOLD_LANES", 0)
    monkeypatch.setattr(jk, "_FUSED_BANDED", True)
    u, v, ex, ey, et, invd = _problem(300, 140, seed=7)
    uo, vo = jk.jacobi_sweeps(u, v, ex, ey, et, invd, n, block_sweeps=s, interpret=True)
    ur, vr = _oracle_sweeps(u, v, ex, ey, et, invd, n)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(ur), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=2e-6)
    # and the multi-launch path agrees bit-for-bit in interpret mode
    monkeypatch.setattr(jk, "_FUSED_BANDED", False)
    um, vm = jk.jacobi_sweeps(u, v, ex, ey, et, invd, n, block_sweeps=s, interpret=True)
    np.testing.assert_array_equal(np.asarray(uo), np.asarray(um))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(vm))


@pytest.mark.parametrize("h,w,k,n,s", [
    (300, 140, 2, 9, 4),    # odd h (h % k != 0), remainder block
    (300, 140, 2, 8, 4),    # exact blocks
    (400, 140, 3, 7, 3),    # k=3, remainder
    (299, 251, 2, 5, 2),    # odd everything
])
def test_folded_banded_matches_jnp(h, w, k, n, s, monkeypatch):
    """Lane-folded banded layout (k row segments side-by-side, fold halos
    refreshed per block) == oracle; fold seams sit at true column edges."""
    wp = -(-w // 128) * 128
    monkeypatch.setattr(jk, "_VMEM_BUDGET", 1)
    monkeypatch.setattr(jk, "_FOLD_LANES", k * wp)
    monkeypatch.setattr(jk, "_BAND_ROWS", 0)
    u, v, ex, ey, et, invd = _problem(h, w, seed=11)
    assert jk._pick_fold(h, wp, 8, s) == k  # the routing actually folds
    uo, vo = jk.jacobi_sweeps(u, v, ex, ey, et, invd, n, block_sweeps=s,
                              interpret=True)
    ur, vr = _oracle_sweeps(u, v, ex, ey, et, invd, n)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(ur), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=2e-6)
    # folded == unfolded banded bit-for-bit in interpret mode
    monkeypatch.setattr(jk, "_FOLD_LANES", 0)
    um, vm = jk.jacobi_sweeps(u, v, ex, ey, et, invd, n, block_sweeps=s,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(uo), np.asarray(um))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(vm))


def test_pick_fold_respects_overhead_bound(monkeypatch):
    monkeypatch.setattr(jk, "_FOLD_LANES", 3840)
    # 1080p fp32: fold to 2x (3840 lanes); halo overhead 2*16/544 ~ 6%.
    assert jk._pick_fold(1088, 1920, 8, 16) == 2
    # already wide: no fold
    assert jk._pick_fold(2176, 3840, 8, 16) == 1
    # too short to amortize fold halos: no fold
    assert jk._pick_fold(160, 1920, 8, 16) == 1
    # default: folding is off (solve-context control showed the window-shape
    # advantage is ~8%, eaten by fold-halo redundancy; docs/PERFORMANCE.md)
    monkeypatch.setattr(jk, "_FOLD_LANES", 0)
    assert jk._pick_fold(1088, 1920, 8, 16) == 1


def test_band_shorter_than_image(monkeypatch):
    # Image smaller than one band: degenerate single-band grid.
    monkeypatch.setattr(jk, "_VMEM_BUDGET", 1)
    monkeypatch.setattr(jk, "_BAND_ROWS", 256)
    monkeypatch.setattr(jk, "_FOLD_LANES", 0)
    u, v, ex, ey, et, invd = _problem(40, 130, seed=5)
    uo, vo = jk.jacobi_sweeps(u, v, ex, ey, et, invd, 2, interpret=True)
    ur, vr = _oracle_sweeps(u, v, ex, ey, et, invd, 2)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(ur), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=2e-6)


@pytest.mark.tpu
def test_pallas_backend_on_tpu(small_translation_pair):
    i1, i2, _ = small_translation_pair
    cfg_j = HSConfig(alpha=0.5, iters=64, backend="jnp")
    cfg_p = HSConfig(alpha=0.5, iters=64, backend="pallas")
    fj = hs_solve(jnp.asarray(i1), jnp.asarray(i2), cfg_j)
    fp = hs_solve(jnp.asarray(i1), jnp.asarray(i2), cfg_p)
    np.testing.assert_allclose(np.asarray(fp.u), np.asarray(fj.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fp.v), np.asarray(fj.v), atol=1e-5)


@pytest.mark.parametrize("b,shape", [(3, (37, 51)), (2, (64, 128)), (5, (16, 40))])
def test_batched_kernel_matches_per_image(b, shape):
    """(B,H,W) stacked kernel == per-image oracle loop."""
    us, vs, urs, vrs = [], [], [], []
    probs = [_problem(*shape, seed=10 + k) for k in range(b)]
    u = jnp.stack([p[0] for p in probs])
    v = jnp.stack([p[1] for p in probs])
    ex = jnp.stack([p[2] for p in probs])
    ey = jnp.stack([p[3] for p in probs])
    et = jnp.stack([p[4] for p in probs])
    invd = jnp.stack([p[5] for p in probs])
    uo, vo = jk.jacobi_sweeps_batched(u, v, ex, ey, et, invd, 6, interpret=True)
    assert uo.shape == (b, *shape)
    for k in range(b):
        ur, vr = _oracle_sweeps(*probs[k], 6)
        np.testing.assert_allclose(np.asarray(uo[k]), np.asarray(ur), atol=2e-6)
        np.testing.assert_allclose(np.asarray(vo[k]), np.asarray(vr), atol=2e-6)


def test_batched_kernel_chunking(monkeypatch):
    """VMEM chunk splitting preserves results."""
    # budget fits ~1 image per chunk
    b, shape = 4, (16, 128)
    hp, wp = 16, 128
    monkeypatch.setattr(jk, "_VMEM_BUDGET", hp * wp * 4 * jk._VMEM_ARRAYS + 1)
    probs = [_problem(*shape, seed=20 + k) for k in range(b)]
    stacks = [jnp.stack([p[i] for p in probs]) for i in range(6)]
    uo, vo = jk.jacobi_sweeps_batched(*stacks, 4, interpret=True)
    for k in range(b):
        ur, vr = _oracle_sweeps(*probs[k], 4)
        np.testing.assert_allclose(np.asarray(uo[k]), np.asarray(ur), atol=2e-6)


def test_batched_solve_pallas_backend_matches_jnp():
    """hs_solve_batched routes pallas through the stacked kernel."""
    from opticalflowhs_tpu.batch import hs_solve_batched

    rng = np.random.default_rng(3)
    i1 = jnp.asarray(rng.uniform(0, 1, (3, 24, 40)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (3, 24, 40)).astype(np.float32))
    fp = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=10, backend="pallas"))
    fj = hs_solve_batched(i1, i2, HSConfig(alpha=0.5, iters=10, backend="jnp"))
    np.testing.assert_allclose(np.asarray(fp.u), np.asarray(fj.u), atol=2e-6)
    np.testing.assert_allclose(np.asarray(fp.v), np.asarray(fj.v), atol=2e-6)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_shapes_vs_oracle(seed):
    """Randomized shapes/sweep counts across both kernel paths vs oracle."""
    rng = np.random.default_rng(100 + seed)
    h = int(rng.integers(9, 200))
    w = int(rng.integers(17, 300))
    n = int(rng.integers(1, 12))
    u, v, ex, ey, et, invd = _problem(h, w, seed=200 + seed)
    uo, vo = jk.jacobi_sweeps(u, v, ex, ey, et, invd, n, interpret=True)
    ur, vr = _oracle_sweeps(u, v, ex, ey, et, invd, n)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(ur), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=2e-6)


@pytest.mark.parametrize("n_sweeps,bs", [(6, 2), (7, 3)])
def test_batched_banded_kernel_matches_per_image(monkeypatch, n_sweeps, bs):
    """(B, nb)-grid banded kernel (frames beyond the stacked-VMEM budget)
    == per-image oracle, including remainder sweep blocks and row counts
    that do not divide the band."""
    b, shape = 3, (49, 160)
    # Force the banded route (tiny per-image byte threshold) and several
    # bands per image (tiny per-band budget -> band = 2*sublane = 16 rows).
    monkeypatch.setattr(jk, "_BATCH_IMG_BYTES", 1)
    monkeypatch.setattr(jk, "_VMEM_BUDGET", 1)
    probs = [_problem(*shape, seed=30 + k) for k in range(b)]
    stacks = [jnp.stack([p[i] for p in probs]) for i in range(6)]
    uo, vo = jk.jacobi_sweeps_batched(
        *stacks, n_sweeps, block_sweeps=bs, interpret=True
    )
    assert uo.shape == (b, *shape)
    for k in range(b):
        ur, vr = _oracle_sweeps(*probs[k], n_sweeps)
        np.testing.assert_allclose(np.asarray(uo[k]), np.asarray(ur), atol=2e-6)
        np.testing.assert_allclose(np.asarray(vo[k]), np.asarray(vr), atol=2e-6)


def test_tile_sweeps_banded_fallback_matches_vmem(monkeypatch):
    """Big per-chip tiles (beyond whole-tile VMEM residency) route through
    the banded kernel with global-origin masks; results must equal the
    VMEM tile path exactly."""
    th, tw, h, w, n = 40, 160, 96, 300, 3
    probs = _problem(th, tw, seed=42)
    row0, col0 = 24, 64  # interior tile of a larger (h, w) image
    ref = jk.tile_sweeps(*[probs[i] for i in (0, 1, 2, 3, 4, 5)], n,
                         row0, col0, h, w, interpret=True)
    monkeypatch.setattr(jk, "_VMEM_BUDGET", 1)
    got = jk.tile_sweeps(*[probs[i] for i in (0, 1, 2, 3, 4, 5)], n,
                         row0, col0, h, w, interpret=True)
    # Only the owned region (halo ring cropped by the caller) is defined:
    # the n-deep decay ring is garbage in BOTH paths, but different garbage.
    s = slice(n, -n)
    np.testing.assert_allclose(np.asarray(got[0][s, s]),
                               np.asarray(ref[0][s, s]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got[1][s, s]),
                               np.asarray(ref[1][s, s]), atol=2e-6)


def test_tile_sweeps_banded_fallback_edge_tile(monkeypatch):
    """Banded big-tile path on a tile containing the true global top-left
    corner (masks at offset coordinates)."""
    th, tw, h, w, n = 48, 256, 96, 300, 2
    probs = _problem(th, tw, seed=43)
    ref = jk.tile_sweeps(*[probs[i] for i in (0, 1, 2, 3, 4, 5)], n,
                         -2, -2, h, w, interpret=True)
    monkeypatch.setattr(jk, "_VMEM_BUDGET", 1)
    got = jk.tile_sweeps(*[probs[i] for i in (0, 1, 2, 3, 4, 5)], n,
                         -2, -2, h, w, interpret=True)
    s = slice(n, -n)
    np.testing.assert_allclose(np.asarray(got[0][s, s]),
                               np.asarray(ref[0][s, s]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got[1][s, s]),
                               np.asarray(ref[1][s, s]), atol=2e-6)


@pytest.mark.parametrize("variant", ["hs_cube", "central"])
@pytest.mark.parametrize("shape", [(37, 51), (64, 128), (16, 300)])
def test_derivative_kernel_matches_oracle(variant, shape):
    """Fused Pallas derivatives+inv_den == stencils.derivatives oracle."""
    from opticalflowhs_tpu.kernels.derivatives import derivatives_precompute
    from opticalflowhs_tpu.ops import stencils

    h, w = shape
    rng = np.random.default_rng(50)
    i1 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    alpha = 0.7
    ex, ey, et, invd = derivatives_precompute(i1, i2, alpha, variant,
                                              interpret=True)
    exr, eyr, etr = stencils.derivatives(i1, i2, variant)
    invr = 1.0 / (alpha * alpha + exr * exr + eyr * eyr)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(exr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ey), np.asarray(eyr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(et), np.asarray(etr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(invd), np.asarray(invr), rtol=1e-6)


def test_derivative_kernel_batched():
    from opticalflowhs_tpu.kernels.derivatives import derivatives_precompute
    from opticalflowhs_tpu.ops import stencils

    rng = np.random.default_rng(51)
    i1 = jnp.asarray(rng.uniform(0, 1, (3, 24, 40)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (3, 24, 40)).astype(np.float32))
    ex, ey, et, invd = derivatives_precompute(i1, i2, 0.5, interpret=True)
    exr, eyr, etr = stencils.derivatives(i1, i2)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(exr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(et), np.asarray(etr), atol=1e-6)
    assert ex.shape == (3, 24, 40)


def test_derivative_kernel_multiband(monkeypatch):
    """Band halo slabs across several bands stay exact."""
    from opticalflowhs_tpu.kernels import derivatives as dk
    from opticalflowhs_tpu.ops import stencils

    monkeypatch.setattr(dk, "_VMEM_BUDGET", 1)  # band = 2*sublane = 16
    rng = np.random.default_rng(52)
    i1 = jnp.asarray(rng.uniform(0, 1, (49, 160)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 1, (49, 160)).astype(np.float32))
    ex, ey, et, invd = dk.derivatives_precompute(i1, i2, 0.5, interpret=True)
    exr, eyr, etr = stencils.derivatives(i1, i2)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(exr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ey), np.asarray(eyr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(et), np.asarray(etr), atol=1e-6)
