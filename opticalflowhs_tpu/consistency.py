"""Forward-backward consistency and occlusion masks.

A capability the reference app class stops short of (SURVEY.md §2a ends at
R8 visualization) but that production flow consumers need: a flow vector is
trustworthy only where the backward flow, sampled at the forward target,
cancels it. Occlusion = the standard Sundaram/Brox-style test

    |f_fwd(x) + f_bwd(x + f_fwd(x))|^2  >  a*(|f_fwd(x)|^2
                                            + |f_bwd(x + f_fwd(x))|^2) + b

with (a, b) = (0.01, 0.5) defaults.

TPU shape: BOTH directions solve in ONE batched call — the stack
[(i1, i2), (i2, i1)] rides the stacked/banded Pallas kernels (batch.py), so
fwd+bwd costs one solve's wall-clock at batch 2, not two solves. The
compose step is two bilinear warps (pyramid.warp, the once-per-solve gather
class — never in the sweep loop, SURVEY.md §7 hard-parts note).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from opticalflowhs_tpu.batch import hs_solve_batched
from opticalflowhs_tpu.config import HSConfig, PyramidConfig
from opticalflowhs_tpu.pyramid import warp
from opticalflowhs_tpu.solver import Flow


def _warped_backward(fwd: Flow, bwd: Flow, method: str):
    """The two bilinear warps (the only expensive ops here): backward flow
    sampled at the forward targets. Shared by fb_error/occlusion_mask so
    combined callers pay 2 warps, not 4 (under jit XLA CSEs them anyway)."""
    bu = warp(bwd.u, fwd.u, fwd.v, method)
    bv = warp(bwd.v, fwd.u, fwd.v, method)
    return bu, bv


def fb_error(fwd: Flow, bwd: Flow, method: str = "gather") -> jnp.ndarray:
    """|f_fwd(x) + f_bwd(x + f_fwd(x))| per pixel (H, W).

    `method` follows pyramid.warp ("gather" default: correct for arbitrary
    flows; "tiled" is faster for smooth flows)."""
    bu, bv = _warped_backward(fwd, bwd, method)
    return jnp.sqrt((fwd.u + bu) ** 2 + (fwd.v + bv) ** 2)


def occlusion_mask(
    fwd: Flow,
    bwd: Flow,
    a: float = 0.01,
    b: float = 0.5,
    method: str = "gather",
) -> jnp.ndarray:
    """Boolean (H, W): True where the forward flow FAILS the
    forward-backward test — occluded or unreliable pixels."""
    bu, bv = _warped_backward(fwd, bwd, method)
    err2 = (fwd.u + bu) ** 2 + (fwd.v + bv) ** 2
    mag2 = fwd.u**2 + fwd.v**2 + bu**2 + bv**2
    return err2 > a * mag2 + b


def solve_bidirectional(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig = HSConfig(),
    pyr: Optional[PyramidConfig] = None,
) -> tuple[Flow, Flow]:
    """(forward, backward) flow for one pair via a single batch-2 solve
    (both directions share every kernel launch)."""
    if i1.ndim != 2:
        raise ValueError(f"expected (H, W) frames, got {i1.shape}")
    if cfg.solver == "sor" and cfg.omega == 0.0:
        # Semantically a single pair: resolve the auto-omega sentinel here
        # (the batched entry's single-pair-only guard would reject it).
        import dataclasses

        from opticalflowhs_tpu.solver import tune_omega

        cfg = dataclasses.replace(cfg, omega=tune_omega(i1, i2, cfg))
    b1 = jnp.stack([i1, i2])
    b2 = jnp.stack([i2, i1])
    f = hs_solve_batched(b1, b2, cfg, pyr)
    return Flow(f.u[0], f.v[0]), Flow(f.u[1], f.v[1])


def flow_with_occlusion(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    cfg: HSConfig = HSConfig(),
    pyr: Optional[PyramidConfig] = None,
    a: float = 0.01,
    b: float = 0.5,
) -> tuple[Flow, jnp.ndarray]:
    """Forward flow plus its occlusion mask, one call."""
    fwd, bwd = solve_bidirectional(i1, i2, cfg, pyr)
    return fwd, occlusion_mask(fwd, bwd, a=a, b=b)
