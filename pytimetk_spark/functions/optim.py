"""Tiny dependency-free Nelder-Mead simplex minimizer (numpy only).

Used by the ts_features holt/hw parameter and GARCH fits inside
applyInPandas kernels — scipy is not a dependency of this engine, and the
objective dimensionality is tiny (2-4 params), where the classic simplex
(Nelder & Mead 1965) is perfectly adequate.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np


def nelder_mead(
    f: Callable[[np.ndarray], float],
    x0: np.ndarray,
    step: float = 0.1,
    max_iter: int = 400,
    tol: float = 1e-8,
) -> np.ndarray:
    """Minimize ``f`` from ``x0``; standard reflection/expansion/
    contraction/shrink coefficients (1, 2, 0.5, 0.5)."""
    x0 = np.asarray(x0, dtype=float)
    n = x0.size
    simplex = [x0]
    for i in range(n):
        p = x0.copy()
        p[i] += step if p[i] == 0 else step * max(abs(p[i]), 1e-3)
        simplex.append(p)
    simplex = np.array(simplex)
    fx = np.array([f(p) for p in simplex])

    for _ in range(max_iter):
        order = np.argsort(fx)
        simplex, fx = simplex[order], fx[order]
        if abs(fx[-1] - fx[0]) < tol * (abs(fx[0]) + tol):
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = centroid + (centroid - simplex[-1])
        fr = f(xr)
        if fr < fx[0]:
            xe = centroid + 2.0 * (centroid - simplex[-1])
            fe = f(xe)
            simplex[-1], fx[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fx[-2]:
            simplex[-1], fx[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = f(xc)
            if fc < fx[-1]:
                simplex[-1], fx[-1] = xc, fc
            else:
                simplex = simplex[0] + 0.5 * (simplex - simplex[0])
                fx = np.array([f(p) for p in simplex])
    return simplex[np.argmin(fx)]
