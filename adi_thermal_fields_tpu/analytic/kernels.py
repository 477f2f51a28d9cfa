"""Shared closed-form heat kernels (host-side numpy/scipy)."""
from __future__ import annotations

import numpy as np
from scipy.special import erfcx

__all__ = ["robin_halfspace_G"]


def robin_halfspace_G(s, xi, u: float, alpha: float, beta: float) -> np.ndarray:
    """1-D heat kernel on the half line s >= 0 with a Robin film at s = 0
    (``-k dT/ds = h T``; ``beta = h/k``), Carslaw & Jaeger §14.2:

        G = g(s - xi) + g(s + xi)
            - beta e^{beta(s+xi) + alpha beta^2 u} erfc((s+xi)/(2 sqrt(alpha u))
                                                        + beta sqrt(alpha u))

    with the Gaussian ``g(x) = e^{-x^2/(4 alpha u)} / sqrt(4 pi alpha u)``.
    The correction term is evaluated stably via erfcx.  Used by the spiral
    (analytic/spiral.py) and layer-birth (analytic/layer_birth.py) oracles;
    mirrors the reference's `_G_R` (spiral_analytic_solution.py:193-204,
    quick_compare_layer_birth_robin_v3.py:197-204).
    """
    denom = np.sqrt(4.0 * np.pi * alpha * u)
    sqau = np.sqrt(alpha * u)
    smx = s - xi
    spx = s + xi
    ga = np.exp(-smx * smx / (4.0 * alpha * u)) / denom
    gb = np.exp(-spx * spx / (4.0 * alpha * u)) / denom
    arg = spx / (2.0 * sqau) + beta * sqau
    corr = beta * np.exp(-spx * spx / (4.0 * alpha * u)) * erfcx(arg)
    return ga + gb - corr
