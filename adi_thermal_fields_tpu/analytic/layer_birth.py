"""Analytic centerline solution for layer-by-layer accretion of a cylinder.

A rod of radius R grows in +z by slabs of thickness d born at temperature Ts
every t_step seconds; Robin h_side on the lateral surface and Robin h_end on
the (moving) end face.  Centerline solution = disk Robin modes (m=0 radial
decay) x Robin half-space Green's kernel integrated over each slab, with the
front frozen at the evaluation-time rod end — the model of reference
quick_compare_layer_birth_robin_v3.py:197-230 (Cartesian) and
quick_compare_layer_birth_robin_cyl_v3.py:13-78 (cylindrical axis; the same
centerline formula, so this module serves both ports).

Extension over the reference: an optional sequential rebirth amplitude
correction (`rebirth_correction=True`, default) subtracting each new layer's
pre-heat at its own mid-slab location, as in analytic/spiral.py — pure
superposition exceeds Ts near the front when layers are born onto a hot rod.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .endface import robin_disk_modes
from .kernels import robin_halfspace_G

__all__ = ["LayerBirthConfig", "layer_birth_centerline"]


@dataclasses.dataclass(frozen=True)
class LayerBirthConfig:
    k: float
    rho: float
    cp: float
    R: float
    h_side: float
    h_end: float
    T_inf: float
    Ts: float
    d: float                # layer thickness [m]
    t_step: float           # time between births [s]
    n_layers: int
    n_modes: int = 20
    n_xi_quad: int = 64
    rebirth_correction: bool = True

    @property
    def alpha(self) -> float:
        return self.k / (self.rho * self.cp)

    @property
    def delta_T(self) -> float:
        return self.Ts - self.T_inf


def _radial_factor(cfg: LayerBirthConfig, lam, C, u: float) -> float:
    """Centerline (J0(0)=1) sum of disk Robin modes with their decay."""
    return float(np.sum(C * np.exp(-cfg.alpha * lam * lam * u)))


def _slab_profile(cfg: LayerBirthConfig, s: np.ndarray, offset: float,
                  u: float) -> np.ndarray:
    xi = np.linspace(0.0, cfg.d, cfg.n_xi_quad)
    G = robin_halfspace_G(np.asarray(s)[:, None], xi[None, :] + offset, u,
                          cfg.alpha, cfg.h_end / cfg.k)
    return np.trapezoid(G, xi, axis=1)


def _amplitudes(cfg: LayerBirthConfig, lam, C) -> np.ndarray:
    """Per-layer deposit amplitudes; with rebirth correction, layer j carries
    ``delta_T - theta_pre`` evaluated at its own mid-slab at birth time."""
    amps = np.zeros(cfg.n_layers)
    for j in range(cfg.n_layers):
        theta_pre = 0.0
        if cfg.rebirth_correction:
            t_j = j * cfg.t_step
            for i in range(j):
                u = t_j - i * cfg.t_step
                # front at birth of layer j: top of layer j-1... but layer i's
                # own front while it was on top was (i+1) d; use the covering
                # front j*d (material up to layer j-1's top).
                front = j * cfg.d
                offset = front - (i + 1) * cfg.d
                s_eval = front - (j + 0.5) * cfg.d  # mid-slab of layer j
                zp = float(_slab_profile(cfg, np.asarray([max(s_eval, 0.0)]),
                                         offset, u)[0])
                theta_pre += amps[i] * zp * _radial_factor(cfg, lam, C, u)
        amps[j] = cfg.delta_T - theta_pre
    return amps


def layer_birth_centerline(cfg: LayerBirthConfig, z: np.ndarray,
                           t: float) -> np.ndarray:
    """Centerline temperature at heights z (z=0 at the first layer's base;
    negative z = pre-existing rod) at time t.  Void positions (above the
    current front) return NaN."""
    mu, C = robin_disk_modes(cfg.h_side * cfg.R / cfg.k, cfg.n_modes)
    lam = mu / cfg.R
    amps = _amplitudes(cfg, lam, C)

    n_now = min(cfg.n_layers, int(np.floor(t / cfg.t_step)) + 1) if t >= 0 else 0
    L = n_now * cfg.d
    z = np.asarray(z, float)
    theta = np.full(z.shape, np.nan)
    exist = z <= L + 1e-15
    theta[exist] = 0.0
    s = L - z[exist]
    for j in range(n_now):
        u = t - j * cfg.t_step
        if u <= 0.0:
            continue
        offset = (n_now - 1 - j) * cfg.d
        prof = _slab_profile(cfg, np.maximum(s, 0.0), offset, u)
        theta[exist] += amps[j] * prof * _radial_factor(cfg, lam, C, u)
    return cfg.T_inf + theta
