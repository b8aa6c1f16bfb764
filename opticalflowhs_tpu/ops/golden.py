"""Golden NumPy Horn-Schunck (component N1, SURVEY.md §2d).

Direct, deliberately-slow transcription of the behavioral contract in
SURVEY.md §2.5 (Horn & Schunck 1981, eqs. D/A/U). This is the root of the
oracle chain (§4): it is validated against analytic ground-truth warps, and
every faster implementation (jnp ops, the jitted solver, the Pallas kernels,
the tiled multi-chip solver) must match it to float tolerance.

Covers the reference's R1 (derivative kernel), R2 (neighborhood average),
R3 (Jacobi update) and R5 (solver loop) — SURVEY.md §2a — as a CPU-runnable
reference (driver config 1).

NumPy only; no JAX imports, so it can never share a bug with the code under
test.
"""

from __future__ import annotations

import numpy as np


def _shift_up_row(a: np.ndarray) -> np.ndarray:
    """a(i+1, j) with replicate clamp at the last row."""
    return np.concatenate([a[1:], a[-1:]], axis=0)


def _shift_down_row(a: np.ndarray) -> np.ndarray:
    """a(i-1, j) with replicate clamp at the first row."""
    return np.concatenate([a[:1], a[:-1]], axis=0)


def _shift_left_col(a: np.ndarray) -> np.ndarray:
    """a(i, j+1) with replicate clamp at the last column."""
    return np.concatenate([a[:, 1:], a[:, -1:]], axis=1)


def _shift_right_col(a: np.ndarray) -> np.ndarray:
    """a(i, j-1) with replicate clamp at the first column."""
    return np.concatenate([a[:, :1], a[:, :-1]], axis=1)


def derivatives_numpy(
    i1: np.ndarray, i2: np.ndarray, variant: str = "hs_cube"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Spatiotemporal derivatives Ex, Ey, Et (SURVEY.md §2.5 eq. D).

    "hs_cube": HS81 §7 — forward differences averaged over the 2x2x2 cube
    spanning (i,j,k)..(i+1,j+1,k+1), replicate-clamped at the last row/col.
    "central": central spatial differences on I1, Et = I2 - I1.
    """
    i1 = np.asarray(i1, dtype=np.float64)
    i2 = np.asarray(i2, dtype=np.float64)
    if variant == "hs_cube":
        ex = np.zeros_like(i1)
        ey = np.zeros_like(i1)
        for f in (i1, i2):
            fr = _shift_up_row(f)        # f(i+1, j)
            fc = _shift_left_col(f)      # f(i, j+1)
            frc = _shift_left_col(fr)    # f(i+1, j+1)
            ex += (fc - f) + (frc - fr)
            ey += (fr - f) + (frc - fc)
        ex *= 0.25
        ey *= 0.25
        d = i2 - i1
        et = 0.25 * (
            d + _shift_up_row(d) + _shift_left_col(d) + _shift_left_col(_shift_up_row(d))
        )
        return ex, ey, et
    elif variant == "central":
        ex = 0.5 * (_shift_left_col(i1) - _shift_right_col(i1))
        ey = 0.5 * (_shift_up_row(i1) - _shift_down_row(i1))
        et = i2 - i1
        return ex, ey, et
    raise ValueError(f"unknown derivative variant {variant!r}")


def neighbor_avg_numpy(u: np.ndarray) -> np.ndarray:
    """8-neighbor weighted average (SURVEY.md §2.5 eq. A; HS81 eq. 9).

    Weights: 1/6 for the 4-neighborhood, 1/12 for diagonals (sum = 1).
    Boundary: replicate-edge (Neumann).
    """
    up = _shift_down_row(u)      # u(i-1, j)
    down = _shift_up_row(u)      # u(i+1, j)
    left = _shift_right_col(u)   # u(i, j-1)
    right = _shift_left_col(u)   # u(i, j+1)
    ul = _shift_right_col(up)    # u(i-1, j-1)
    ur = _shift_left_col(up)     # u(i-1, j+1)
    dl = _shift_right_col(down)  # u(i+1, j-1)
    dr = _shift_left_col(down)   # u(i+1, j+1)
    return (up + down + left + right) / 6.0 + (ul + ur + dl + dr) / 12.0


def jacobi_step_numpy(
    u: np.ndarray,
    v: np.ndarray,
    ex: np.ndarray,
    ey: np.ndarray,
    et: np.ndarray,
    alpha: float,
) -> tuple[np.ndarray, np.ndarray]:
    """One Jacobi sweep: neighborhood average + update (SURVEY.md §2.5 eq. U)."""
    ubar = neighbor_avg_numpy(u)
    vbar = neighbor_avg_numpy(v)
    num = ex * ubar + ey * vbar + et
    den = alpha * alpha + ex * ex + ey * ey
    frac = num / den
    return ubar - ex * frac, vbar - ey * frac


def hs_numpy(
    i1: np.ndarray,
    i2: np.ndarray,
    alpha: float = 1.0,
    iters: int = 100,
    deriv_variant: str = "hs_cube",
    u0: np.ndarray | None = None,
    v0: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Full golden Horn-Schunck solve. Returns (u, v) in float64.

    u0/v0 allow warm starts (used by the pyramid oracle); default zeros.
    """
    ex, ey, et = derivatives_numpy(i1, i2, deriv_variant)
    u = np.zeros_like(ex) if u0 is None else np.asarray(u0, dtype=np.float64)
    v = np.zeros_like(ex) if v0 is None else np.asarray(v0, dtype=np.float64)
    for _ in range(iters):
        u, v = jacobi_step_numpy(u, v, ex, ey, et, alpha)
    return u, v
