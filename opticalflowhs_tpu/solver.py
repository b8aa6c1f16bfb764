"""Horn-Schunck solver core (component N3, SURVEY.md §2d — layer T2).

The TPU-idiomatic replacement for the reference's host-driven hot loop
(SURVEY.md §3.1): instead of n x (enqueue average kernel, enqueue update
kernel, swap ping-pong buffers) with per-launch overhead, the whole solve is
one `jax.jit` region — derivatives once, loop-invariant `inv_den` hoisted,
then a `lax.fori_loop` of fused Jacobi sweeps that never leaves the device
(SURVEY.md §3.2).

Backends:
  - "jnp":    pure-jnp sweeps (ops/stencils.py) — runs everywhere, and is the
              oracle twin for the Pallas path.
  - "pallas": fused Mosaic/TPU stencil kernels (kernels/jacobi.py).
  - "auto":   pallas on TPU, jnp otherwise.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from opticalflowhs_tpu.config import HSConfig
from opticalflowhs_tpu.ops import stencils


class Flow(NamedTuple):
    """Dense flow field. u = horizontal (x / column) motion, v = vertical."""

    u: jnp.ndarray
    v: jnp.ndarray


def resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "jnp"
    return backend


def fused_solve_enabled(iters: int, batched: bool = False) -> bool:
    """Route through the whole-solve fused pipeline (kernels/solve_fused.py)?

    HSFLOW_FUSED_SOLVE: "1" forces on, "0" forces off; the default "auto"
    enables it exactly where the hardware A/B won
    (tools/hw_solve_fused_ab.py, TPU v5e, 2026-08-18): single-frame
    solves with a deep sweep schedule — 1080p i100 37.9 vs 37.0 and
    4K i100 45.1 vs 39.7 Gpx·sweeps/s — and leaves it off where it lost:
    shallow schedules (1080p i20 −4.8%), 8K i50 (−1.8%), and batched
    stacks (B2×1080p 36.1 fused vs 48.5 on the batched-banded kernel).
    """
    import os

    mode = os.environ.get("HSFLOW_FUSED_SOLVE", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return not batched and iters >= 64


def resident_solve_enabled(iters: int, batched: bool = False) -> bool:
    """Route through the VMEM-resident whole-solve kernel
    (kernels/solve_resident.py)?

    HSFLOW_RESIDENT_SOLVE: "1" forces on, "0" forces off; the default
    "auto" enables both the single-frame and the batched path for any
    fixed-count Jacobi solve — the single-frame case strictly removes
    launches, field HBM round-trips, window DMAs, halo redundancy, and
    per-sweep edge masks relative to the other schedules (hardware A/B:
    tools/hw_resident_ab.py), and the batched grid=(B,) variant won its
    round-4 A/B decisively (tools/hw_resident_batched.py, 2026-08-20,
    n=30 steady-state chains: B2x1080p i100 5.30 ms / 78.9 Gpx*sweeps/s
    vs 6.77 / 61.8 batched-banded, maxdiff 0.0 on hardware).
    hs_solve_resident{,_batched} return None outside their residency
    class so the fallback chain is unchanged."""
    import os

    mode = os.environ.get("HSFLOW_RESIDENT_SOLVE", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return iters >= 2


def skewed_solve_enabled(iters: int, batched: bool = False) -> bool:
    """Route through the u/v-resident time-skewed kernel
    (kernels/solve_skewed.py) for beyond-residency frames (~2.6-11 Mpx)?

    HSFLOW_SKEWED_SOLVE: "1" forces on, "0" forces off; "auto" (default)
    enables the SINGLE-FRAME path for sweep schedules deep enough to
    amortize the pencil bookkeeping — it won its 4K A/B (13.93 vs
    14.38 ms fused, tools/hw_skewed_ab.py) — and leaves the batched twin
    off: at B2x4K the batched-banded (batch, bands) grid already
    amortizes dispatch and measured 26.58 ms (62.9 Gpx*sweeps/s) vs
    27.26 (61.3) for batched skewed (tools/hw_skewed_batched.py,
    2026-08-20; both exact 0.0). The kernel itself returns None outside
    its class, so the fallback chain is unchanged either way."""
    import os

    mode = os.environ.get("HSFLOW_SKEWED_SOLVE", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    # iters >= 64: at 4K i20 the classic multi-launch path measured 4.15 ms
    # vs 4.29 skewed (shallow schedules don't recoup the pencil/window
    # machinery — same boundary the fused pipeline uses); at i100 skewed
    # wins 13.93 vs 14.38 fused.
    return not batched and iters >= 64


def precompute(i1: jnp.ndarray, i2: jnp.ndarray, cfg: HSConfig):
    """Derivatives + hoisted 1/(alpha^2 + Ex^2 + Ey^2) (SURVEY.md §3.2).

    On the pallas backend this is ONE fused banded kernel pass (the XLA
    lowering of the same math costs ~25% of a low-iteration solve —
    kernels/derivatives.py); the jnp path is its oracle twin.
    """
    import os

    dtype = jnp.dtype(cfg.dtype)
    i1 = i1.astype(dtype)
    i2 = i2.astype(dtype)
    if (
        resolve_backend(cfg.backend) == "pallas"
        and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
    ):
        from opticalflowhs_tpu.kernels.derivatives import derivatives_precompute

        return derivatives_precompute(i1, i2, cfg.alpha, cfg.deriv_variant)
    ex, ey, et = stencils.derivatives(i1, i2, cfg.deriv_variant)
    inv_den = 1.0 / (cfg.alpha * cfg.alpha + ex * ex + ey * ey)
    return ex, ey, et, inv_den


def sweeps(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    n: int,
    cfg: HSConfig,
) -> Flow:
    """Run `n` relaxation sweeps on-device. `n` and `cfg` are trace-static."""
    backend = resolve_backend(cfg.backend)
    if n == 0:
        return Flow(u, v)
    if cfg.solver == "multigrid":
        # V-cycles (n = cycle count). jnp/XLA on every backend: the cycle
        # is dominated by O(levels) small grids where a Pallas launch per
        # smoothing stage would be dispatch-bound (docs/PERFORMANCE.md).
        from opticalflowhs_tpu.multigrid import mg_sweeps

        u, v = mg_sweeps(u, v, ex, ey, et, inv_den, n, cfg)
        return Flow(u, v)
    if cfg.solver == "robust":
        # Charbonnier IRLS (robust.py): jnp/XLA on every backend — the
        # sweep is elementwise + 4 shifts, fully fused by XLA; a Pallas
        # version would re-pay per-launch dispatch per weight block.
        from opticalflowhs_tpu.robust import robust_sweeps

        u, v = robust_sweeps(u, v, ex, ey, et, n, cfg)
        return Flow(u, v)
    if cfg.solver == "sor":
        from opticalflowhs_tpu.kernels import sor as sor_kernels

        if backend == "pallas":
            # Routes whole-image VMEM residency or banded temporal blocking
            # internally (kernels/sor.py).
            u, v = sor_kernels.sor_sweeps(
                u, v, ex, ey, et, inv_den, n, cfg.omega
            )
            return Flow(u, v)
        colors = stencils.color_masks(*u.shape[-2:])

        # sqrt(n)-checkpointed: same arithmetic, O(sqrt(n)) grad memory.
        u, v = stencils.checkpointed_loop(
            lambda uv: stencils.sor_step(
                uv[0], uv[1], ex, ey, et, inv_den, cfg.omega, colors
            ),
            (u, v), n,
        )
        return Flow(u, v)
    if backend == "pallas":
        from opticalflowhs_tpu.kernels import jacobi as jacobi_kernels

        u, v = jacobi_kernels.jacobi_sweeps(
            u, v, ex, ey, et, inv_den, n, block_sweeps=cfg.block_sweeps
        )
        return Flow(u, v)

    # sqrt(n)-checkpointed loop: identical sweep sequence, but reverse-mode
    # AD stores only ~sqrt(n) block-boundary states (gradients through a
    # 1080p x 800-sweep solve would otherwise tape tens of GB).
    u, v = stencils.checkpointed_loop(
        lambda uv: stencils.jacobi_step(uv[0], uv[1], ex, ey, et, inv_den),
        (u, v), n,
    )
    return Flow(u, v)


def sweeps_until(
    u: jnp.ndarray,
    v: jnp.ndarray,
    ex: jnp.ndarray,
    ey: jnp.ndarray,
    et: jnp.ndarray,
    inv_den: jnp.ndarray,
    cfg: HSConfig,
    budget: Optional[int] = None,
    run_block=None,
) -> Flow:
    """Solve-to-tolerance (cfg.tol > 0): lax.while_loop over check blocks
    of `block_sweeps` sweeps (1 V-cycle for multigrid), stopping when the
    max u/v update over a block drops below tol or the iteration budget
    (`budget`, default cfg.iters — pyramids pass per-level budgets) is
    exhausted (rounded DOWN to whole blocks — the while_loop trip size is
    trace-static) — entirely on-device, one jit region. The reference's
    loop (SURVEY.md §3.1) can only run a fixed count.

    `run_block(u, v, n) -> (u, v)` overrides the default block runner
    (`sweeps` on the captured fields) — the batched stacked-kernel and
    resident-blocked routes pass their own so the stop semantics live in
    exactly one place (the field args may then be None)."""
    iters = cfg.iters if budget is None else budget
    if run_block is None:
        def run_block(uu, vv, nn):
            return sweeps(uu, vv, ex, ey, et, inv_den, nn, cfg)

    if cfg.solver == "multigrid":
        b = 1
    elif cfg.block_sweeps > 0:
        b = cfg.block_sweeps
    else:
        b = 16
    b = min(b, max(iters, 1))
    big = jnp.asarray(jnp.finfo(u.dtype).max, u.dtype)

    def cond(st):
        _, _, k, delta = st
        return jnp.logical_and(k + b <= iters, delta > cfg.tol)

    def body(st):
        uu, vv, k, _ = st
        nu, nv = run_block(uu, vv, b)
        delta = jnp.maximum(
            jnp.abs(nu - uu).max(), jnp.abs(nv - vv).max()
        )
        return (nu, nv, k + b, delta)

    u, v, _, _ = lax.while_loop(cond, body, (u, v, jnp.int32(0), big))
    return Flow(u, v)


def solve_level(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig,
    iters: int,
    u0: Optional[jnp.ndarray] = None,
    v0: Optional[jnp.ndarray] = None,
    whole_solve_ok: bool = True,
) -> Flow:
    """One fixed-budget solve on a 2-D pair, with the FULL routing chain.

    The single place the whole-solve Pallas schedules are routed: resident
    (kernels/solve_resident.py) -> fused pipeline (kernels/solve_fused.py)
    -> precompute + sweeps / sweeps_until. `_hs_solve_impl` AND the pyramid
    level solves (pyramid.py::_pyramid_body) go through here, so the
    flagship kernel reaches configs 1, 3, and 4 alike (round-3 VERDICT
    item 1: the pyramid used to call precompute+sweeps directly and never
    saw the resident schedule). `iters` is the budget for this level
    (sweeps when cfg.tol == 0, else the sweeps_until cap). Callers that
    trace this body under vmap pass whole_solve_ok=False: the tracer looks
    2-D there, but the manual-DMA grid=() kernels have no batching rule.
    """
    import os

    with_init = u0 is not None
    if (
        whole_solve_ok
        and cfg.solver == "sor"
        and cfg.omega > 0  # omega == 0 means auto-tune upstream (hs_solve)
        and cfg.tol == 0
        and resolve_backend(cfg.backend) == "pallas"
        and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
        and resident_solve_enabled(iters)
        and os.environ.get("HSFLOW_RESIDENT_SOR", "1") != "0"
    ):
        # VMEM-resident 4-color SOR whole solve (round 5): ONE launch for
        # derivatives + every sweep. Won its A/B vs the banded SOR kernel
        # decisively (tools/hw_sor_resident_ab.py); returns None outside
        # its residency class and falls through to kernels/sor.py.
        from opticalflowhs_tpu.kernels.solve_resident import (
            hs_solve_resident_sor,
        )

        dtype = jnp.dtype(cfg.dtype)
        out = hs_solve_resident_sor(
            i1.astype(dtype),
            i2.astype(dtype),
            cfg.alpha,
            iters,
            cfg.omega,
            cfg.deriv_variant,
            u0=u0.astype(dtype) if with_init else None,
            v0=v0.astype(dtype) if with_init else None,
        )
        if out is not None:
            return Flow(*out)
    if (
        whole_solve_ok
        and cfg.solver == "robust"
        and cfg.tol == 0
        and resolve_backend(cfg.backend) == "pallas"
        and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
        and resident_solve_enabled(iters)
        and os.environ.get("HSFLOW_RESIDENT_ROBUST", "1") != "0"
    ):
        # VMEM-resident Charbonnier-IRLS whole solve (round 5): ONE launch
        # for derivatives + every weight refreeze + every sweep — the
        # measured answer to the round-4 "a Pallas version would re-pay
        # per-launch dispatch" claim (tools/hw_robust_ab.py). Returns None
        # outside its residency class; falls through to the jnp IRLS.
        import dataclasses

        from opticalflowhs_tpu.kernels.solve_robust import (
            hs_solve_robust_resident,
        )

        dtype = jnp.dtype(cfg.dtype)
        out = hs_solve_robust_resident(
            i1.astype(dtype),
            i2.astype(dtype),
            # the kernel bakes cfg.iters; honor this call's per-level budget
            cfg if iters == cfg.iters else dataclasses.replace(
                cfg, iters=iters
            ),
            u0=u0.astype(dtype) if with_init else None,
            v0=v0.astype(dtype) if with_init else None,
        )
        if out is not None:
            return Flow(*out)
    if (
        whole_solve_ok
        and cfg.solver == "jacobi"
        and cfg.tol == 0  # whole-solve kernels bake a fixed sweep schedule
        and resolve_backend(cfg.backend) == "pallas"
        and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
    ):
        dtype = jnp.dtype(cfg.dtype)
        if resident_solve_enabled(iters):
            # VMEM-resident whole-solve kernel: derivatives + every sweep
            # in ONE launch, fields and flow buffers resident in VMEM.
            # Returns None outside its residency class.
            from opticalflowhs_tpu.kernels.solve_resident import (
                hs_solve_resident,
            )

            out = hs_solve_resident(
                i1.astype(dtype),
                i2.astype(dtype),
                cfg.alpha,
                iters,
                cfg.deriv_variant,
                u0=u0.astype(dtype) if with_init else None,
                v0=v0.astype(dtype) if with_init else None,
            )
            if out is not None:
                return Flow(*out)
        if skewed_solve_enabled(iters):
            # u/v-resident time-skewed kernel for the 2-array-residency
            # class (auto: >= 6 Mpx, i.e. 4K — HSFLOW_SKEWED_MIN_PX to
            # widen). Returns None outside it.
            from opticalflowhs_tpu.kernels.solve_skewed import hs_solve_skewed

            out = hs_solve_skewed(
                i1.astype(dtype),
                i2.astype(dtype),
                cfg.alpha,
                iters,
                cfg.deriv_variant,
                u0=u0.astype(dtype) if with_init else None,
                v0=v0.astype(dtype) if with_init else None,
            )
            if out is not None:
                return Flow(*out)
        if fused_solve_enabled(iters):
            # Whole-solve fused pipeline: derivatives + every sweep block
            # in two launches, no inter-kernel marshalling. Returns None
            # for frames/configs it does not cover.
            from opticalflowhs_tpu.kernels.solve_fused import hs_solve_fused

            out = hs_solve_fused(
                i1.astype(dtype),
                i2.astype(dtype),
                cfg.alpha,
                iters,
                cfg.deriv_variant,
                s_cap=cfg.block_sweeps,
                u0=u0.astype(dtype) if with_init else None,
                v0=v0.astype(dtype) if with_init else None,
            )
            if out is not None:
                return Flow(*out)
    if (
        whole_solve_ok
        and cfg.tol > 0
        and (cfg.solver == "jacobi"
             or (cfg.solver == "sor" and cfg.omega > 0
                 and os.environ.get("HSFLOW_RESIDENT_SOR", "1") != "0"))
        and resolve_backend(cfg.backend) == "pallas"
        and resident_solve_enabled(max(iters, 2))
        and os.environ.get("HSFLOW_DERIV_KERNEL", "1") != "0"
    ):
        # Resident-blocked solve-to-tolerance: each check block is one
        # warm-started resident whole-solve launch (the in-kernel
        # derivative stage re-runs per block — a few percent of a block —
        # in exchange for the resident schedule's per-sweep rate). The
        # stop semantics stay in sweeps_until. Covers both the Jacobi and
        # (round 5) the 4-color-SOR resident kernels.
        from opticalflowhs_tpu.kernels import solve_resident as _sr

        dtype = jnp.dtype(cfg.dtype)
        b = cfg.block_sweeps if cfg.block_sweeps > 0 else 16
        # class check on the CAST array: the residency budget depends on
        # cfg.dtype, not the caller's input dtype (a bf16 input inside the
        # bf16 class but outside the fp32 class would otherwise route here
        # and have run_block return None mid-while_loop)
        i1c = i1.astype(dtype)
        i2c = i2.astype(dtype)
        is_sor = cfg.solver == "sor"
        applic = _sr.applicable_sor if is_sor else _sr.applicable
        if applic(i1c, b, cfg.deriv_variant) is not None:

            def run_block(uu, vv, nn):
                if is_sor:
                    return _sr.hs_solve_resident_sor(
                        i1c, i2c, cfg.alpha, nn, cfg.omega,
                        cfg.deriv_variant, u0=uu, v0=vv,
                    )
                return _sr.hs_solve_resident(
                    i1c, i2c, cfg.alpha, nn, cfg.deriv_variant,
                    u0=uu, v0=vv,
                )

            u = u0.astype(dtype) if with_init else jnp.zeros_like(i1c)
            v = v0.astype(dtype) if with_init else jnp.zeros_like(i1c)
            return sweeps_until(
                u, v, None, None, None, None, cfg, budget=iters,
                run_block=run_block,
            )
    ex, ey, et, inv_den = precompute(i1, i2, cfg)
    if with_init:
        u = u0.astype(ex.dtype)
        v = v0.astype(ex.dtype)
    else:
        u = jnp.zeros_like(ex)
        v = jnp.zeros_like(ex)
    if cfg.tol > 0:
        return sweeps_until(u, v, ex, ey, et, inv_den, cfg, budget=iters)
    return sweeps(u, v, ex, ey, et, inv_den, iters, cfg)


@partial(jax.jit, static_argnames=("cfg", "with_init"))
def _hs_solve_impl(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    u0: Optional[jnp.ndarray],
    v0: Optional[jnp.ndarray],
    cfg: HSConfig,
    with_init: bool,
) -> Flow:
    del with_init  # encoded in u0/v0 presence; kept for jit cache keying
    return solve_level(i1, i2, cfg, cfg.iters, u0=u0, v0=v0)


@partial(jax.jit, static_argnames=("cfg", "power_iters"))
def _jacobi_rho_impl(i1, i2, cfg: HSConfig, power_iters: int):
    ex, ey, _, inv_den = precompute(i1, i2, cfg)
    zero_et = jnp.zeros_like(ex)
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, ex.shape, ex.dtype)
    v = jax.random.normal(jax.random.fold_in(key, 1), ex.shape, ex.dtype)
    n0 = jnp.sqrt(jnp.sum(u * u) + jnp.sum(v * v))
    tail = max(1, min(10, power_iters // 3))

    def body(k, st):
        uu, vv, acc = st
        nu, nv = stencils.jacobi_step(uu, vv, ex, ey, zero_et, inv_den)
        n = jnp.sqrt(jnp.sum(nu * nu) + jnp.sum(nv * nv))
        # Geometric mean of the last `tail` norm ratios (the iteration
        # matrix is nonsymmetric, so single ratios oscillate).
        acc = acc + jnp.where(k >= power_iters - tail, jnp.log(n), 0.0)
        return (nu / n, nv / n, acc)

    _, _, acc = lax.fori_loop(0, power_iters, body, (u / n0, v / n0, 0.0))
    return jnp.exp(acc / tail)


def tune_omega(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig = HSConfig(),
    power_iters: int = 300,
) -> float:
    """Estimate the optimal SOR over-relaxation factor for this problem.

    Power-iterates the homogeneous Jacobi update (the et-free linear
    operator whose spectral radius rho governs convergence) on-device,
    then applies the classical optimum omega* = 2 / (1 + sqrt(1 - rho^2))
    [Young 1971, consistently-ordered case — a (validated) heuristic for
    the 4-color 8-neighbor ordering]. One-time cost ~power_iters cheap
    sweeps; the result is quantized to 0.01 so repeated tuning on similar
    frames reuses the jit cache of the subsequent solve. The reference app
    class hard-codes omega; here the solver finds it per problem
    (data-dominated small-alpha problems want far less over-relaxation
    than the Laplacian limit). Measured (128x192, fixed 60 sweeps): at
    alpha=0.1 auto=1.51-1.57 vs grid-best 1.5 — 14x lower EPE than the 1.9
    default; at alpha=1 the converged estimate 1.84 matches 1.9 from 120
    sweeps up (at starvation budgets on stiff problems a hand-picked 1.9
    still edges it — but alpha=1 is multigrid's regime anyway)."""
    import dataclasses

    # rho depends only on (alpha, deriv_variant, dtype); normalize every
    # other field so e.g. checkpoint segments with different iters reuse
    # the compiled power loop (compiles are minutes on the real chip).
    key_cfg = dataclasses.replace(
        HSConfig(), alpha=cfg.alpha, deriv_variant=cfg.deriv_variant,
        dtype=cfg.dtype,
    )
    rho = float(_jacobi_rho_impl(i1, i2, key_cfg, power_iters))
    rho = min(rho, 0.9999)
    omega = 2.0 / (1.0 + (1.0 - rho * rho) ** 0.5)
    return round(max(1.0, min(omega, 1.98)), 2)


def hs_solve(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig = HSConfig(),
    init: Optional[Flow] = None,
) -> Flow:
    """Solve Horn-Schunck optical flow for the frame pair (i1, i2).

    Parity: reference R5 solver loop + R1-R3 kernels (SURVEY.md §2a, §3.1),
    with the behavioral contract of SURVEY.md §2.5. `init` warm-starts u/v
    (used by the pyramid and by checkpoint resume); default zeros (HS81).

    cfg.solver="sor" with cfg.omega == 0 auto-tunes omega first
    (`tune_omega`; one extra jit + host readback of a scalar, then the
    solve runs with the tuned static omega).
    """
    if i1.shape != i2.shape:
        raise ValueError(f"frame shapes differ: {i1.shape} vs {i2.shape}")
    if i1.ndim != 2:
        raise ValueError("hs_solve takes single 2-D grayscale frames; use "
                         "batch.hs_solve_batched for leading batch axes")
    if cfg.solver == "sor" and cfg.omega == 0.0:
        import dataclasses

        cfg = dataclasses.replace(cfg, omega=tune_omega(i1, i2, cfg))
    if init is None:
        return _hs_solve_impl(i1, i2, None, None, cfg, False)
    return _hs_solve_impl(i1, i2, init.u, init.v, cfg, True)
