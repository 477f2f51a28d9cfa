"""Analytic solutions for end-face heating of a laterally-convecting cylinder.

Covers the three oracle problems used by the reference's quick_compare
validation drivers: a semi-infinite cylinder of radius R with Robin
convection (h_side) on the lateral surface, initially at T_inf, heated at the
z = 0 end face for t > 0 by

* a Dirichlet temperature step ``T = T_inf + Delta``
  (quick_compare_dirichlet_robin.py:96-113),
* a constant Neumann flux ``q0`` into the solid
  (quick_compare_neumann_robin.py:62-79),
* a Robin film at ambient ``T_inf + Delta`` with coefficient h_end
  (quick_compare_robin_end_robin.py:90-123).

Classical separation of variables: the radial part expands the unit disk
profile in J0 modes with Robin eigencondition ``mu J0'(mu) + Bi J0(mu) = 0``
(Bi = h_side R / k), coefficients ``C_n = 2 J1(mu_n)/(mu_n (J0^2 + J1^2))``;
the axial part multiplies each mode by the textbook semi-infinite kernels
with lateral decay folded in via ``lam_n = mu_n / R`` (Carslaw & Jaeger
§§ 2.5, 14.2 fin solutions).  Evaluation is at the axis (r = 0, J0 = 1), as
in the reference drivers.
"""
from __future__ import annotations

import dataclasses

import numpy as np
from scipy import optimize
from scipy.special import erfc, erfcx, j0, j1, jvp

__all__ = ["EndFaceProblem", "robin_disk_modes", "dirichlet_end_profile",
           "neumann_end_profile", "robin_end_profile"]


def robin_disk_modes(Bi: float, n_roots: int = 18,
                     mu_max: float = 220.0) -> tuple[np.ndarray, np.ndarray]:
    """Roots of ``mu J0'(mu) + Bi J0(mu) = 0`` and the disk projection
    coefficients C_n of the unit profile."""
    def f(mu):
        return mu * jvp(0, mu, 1) + Bi * j0(mu)

    xs = np.linspace(1e-8, mu_max, 40000)
    vals = f(xs)
    roots = []
    sgn = np.sign(vals)
    for i in np.nonzero(sgn[:-1] * sgn[1:] < 0)[0]:
        if not (np.isfinite(vals[i]) and np.isfinite(vals[i + 1])):
            continue
        try:
            r = optimize.brentq(f, xs[i], xs[i + 1], maxiter=200)
        except ValueError:
            continue
        if not roots or abs(r - roots[-1]) > 1e-10:
            roots.append(r)
            if len(roots) >= n_roots:
                break
    mu = np.asarray(roots)
    C = 2.0 * j1(mu) / (mu * (j0(mu) ** 2 + j1(mu) ** 2))
    return mu, C


@dataclasses.dataclass(frozen=True)
class EndFaceProblem:
    """Cylinder geometry/material shared by the three end-face oracles."""

    k: float
    rho: float
    cp: float
    R: float
    h_side: float
    T_inf: float
    n_modes: int = 18

    @property
    def alpha(self) -> float:
        return self.k / (self.rho * self.cp)

    @property
    def Bi(self) -> float:
        return self.h_side * self.R / self.k

    def modes(self):
        mu, C = robin_disk_modes(self.Bi, self.n_modes)
        return mu / self.R, C  # lam_n, C_n


def _AB(z, t, lam, alpha):
    t = max(float(t), 1e-15)
    z = np.asarray(z, float)
    A = z / (2.0 * np.sqrt(alpha * t))
    B = lam * np.sqrt(alpha * t)
    return A, B


def dirichlet_end_profile(p: EndFaceProblem, Delta: float, z, t) -> np.ndarray:
    """Axis temperature for the end-face Dirichlet step ``T_inf + Delta``.
    Kernel F = 1/2 [e^{-lam z} erfc(A-B) + e^{lam z} erfc(A+B)]."""
    lam, C = p.modes()
    out = np.zeros_like(np.asarray(z, float))
    for l, c in zip(lam, C):
        A, B = _AB(z, t, l, p.alpha)
        # e^{lam z} erfc(A+B) evaluated stably via erfcx
        F = 0.5 * (np.exp(-l * np.asarray(z)) * erfc(A - B)
                   + np.exp(l * np.asarray(z) - (A + B) ** 2) * erfcx(A + B))
        out += c * F
    return p.T_inf + Delta * out


def neumann_end_profile(p: EndFaceProblem, q0: float, z, t) -> np.ndarray:
    """Axis temperature for constant end-face flux q0 (positive = heating).
    Kernel K = (1/(2 lam)) [e^{-lam z} erfc(A-B) - e^{lam z - (A+B)^2} erfcx(A+B)]."""
    lam, C = p.modes()
    out = np.zeros_like(np.asarray(z, float))
    for l, c in zip(lam, C):
        A, B = _AB(z, t, l, p.alpha)
        K = (0.5 / l) * (np.exp(-l * np.asarray(z)) * erfc(A - B)
                         - np.exp(l * np.asarray(z) - (A + B) ** 2) * erfcx(A + B))
        out += c * K
    return p.T_inf + (q0 / p.k) * out


def robin_end_profile(p: EndFaceProblem, h_end: float, Delta: float, z,
                      t) -> np.ndarray:
    """Axis temperature for an end-face Robin film at ambient T_inf + Delta.

    Kernel H = beta [ e^{-lam z} erfc(A-B)/(2(beta+lam))
                    + e^{lam z} erfc(A+B)/(2(beta-lam))
                    - beta/(beta^2-lam^2) e^{beta z + alpha beta^2 t - alpha lam^2 t}
                      erfc(A + beta sqrt(alpha t)) ],  beta = h_end/k.
    """
    beta = h_end / p.k
    lam, C = p.modes()
    zf = np.asarray(z, float)
    out = np.zeros_like(zf)
    eps = 1e-12
    for l, c in zip(lam, C):
        A, B = _AB(z, t, l, p.alpha)
        den_p = beta + l
        den_m = beta - l if abs(beta - l) > eps else eps
        den_b = beta * beta - l * l if abs(beta * beta - l * l) > eps else eps
        sq = np.sqrt(p.alpha * max(float(t), 1e-15))
        term1 = np.exp(-l * zf) * erfc(A - B) / (2.0 * den_p)
        term2 = np.exp(l * zf - (A + B) ** 2) * erfcx(A + B) / (2.0 * den_m)
        # e^{beta z + alpha beta^2 t} erfc(A + beta sq) == e^{-A^2} erfcx(A + beta sq)
        term3 = (beta / den_b) * np.exp(-A * A - l * l * p.alpha * float(t)
                                        ) * erfcx(A + beta * sq)
        out += c * beta * (term1 + term2 - term3)
    return p.T_inf + Delta * out
