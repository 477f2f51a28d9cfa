"""Analytic (modal) reference solution for spiral layer deposition in an
annular wall — the framework's north-star correctness oracle.

Physics: an annulus a <= r <= b (inner radius ``r_inner``, wall thickness
``b - a``) grows in z by depositing one arc slice at a time at temperature
``T_deposit``; Robin convection acts on the inner and outer radii and on the
growth front.  Each deposition event is propagated with:

* a radial eigenexpansion ``R_{mn}(r) = J_m(k r) + B Y_m(k r)`` satisfying the
  *physically consistent* Robin conditions at both radii —
  ``k R'(a) - (h_i/k_c) R(a) = 0`` at the inner face (outward normal -r_hat)
  and ``k R'(b) + (h_o/k_c) R(b) = 0`` at the outer face — with time decay
  ``exp(-alpha kappa^2 u)``,
* a Fourier series in phi with the *exact* arc-indicator coefficients
  ``a_m = (2/(m pi)) sin(m Delta/2) cos(m phi_0)`` for an arc of width Delta
  centred at phi_0 (the reference uses the point-mass weight
  ``(Delta/2 pi) cos(m phi_0)`` for every m, which underweights the m >= 1
  harmonics by 2x — spiral_analytic_solution.py:291-292; a recorded deviation),
* the half-space Robin Green's function along the growth axis
  (Carslaw & Jaeger §14.2): ``G(s, xi, u) = g(s - xi) + g(s + xi)
  - beta e^{beta(s+xi) + alpha beta^2 u} erfc((s+xi)/(2 sqrt(alpha u))
  + beta sqrt(alpha u))`` with ``beta = h_end/k_c``, integrated over the layer
  thickness; the front position is frozen at its location at evaluation time
  (quasi-static front), as in the reference
  (spiral_analytic_solution.py:193-204, 264-296).

Role mirrors reference ``spiral_analytic_solution.py`` (API shape:
config -> cached modes -> (phi, z) temperature map at the probe radius);
the derivation here is independent and standard.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
from scipy import optimize
from scipy.special import jv, jvp, yv, yvp

from .kernels import robin_halfspace_G

__all__ = ["SpiralAnalyticConfig", "SpiralModeCache", "build_mode_cache",
           "temperature_map_at_probe"]


@dataclasses.dataclass(frozen=True)
class SpiralAnalyticConfig:
    """Physical and numerical parameters of the analytic spiral model."""

    k: float                 # conductivity [W/m/K]
    rho: float
    cp: float
    T_inf: float
    T_deposit: float
    r_inner: float           # inner radius a [m]
    wall_thickness: float    # b - a [m]
    h_inner: float
    h_outer: float
    h_end: float             # Robin h at the growth front
    layer_height: float
    n_layers: int
    tau_dep: float           # time per full loop [s]
    n_events_per_loop: int   # arc slices per loop
    z_back: float            # substrate extent below z=0 [m]
    nz: int                  # output rows spanning [-z_back, z_front]
    nphi: int                # output columns spanning [0, 2 pi)
    m_max: int = 64          # angular harmonics
    n_radial_modes: int = 6
    probe_radius: float | None = None
    n_xi_quad: int = 64      # layer-thickness quadrature points
    cell_centered_z: bool = True   # evaluate at FV cell centers (numeric grid)
    cell_averaged_phi: bool = True  # compare against phi-cell averages
    cell_averaged_z: bool = True   # average the z-profile over each z cell
    n_z_avg: int = 8               # quadrature points per z cell
    # event time within its slice interval, as a fraction of the slice
    # duration: 0.5 = mid-slice (continuous spiral); 0.0 = slice start
    # (instant ring deposition when n_events_per_loop == 1)
    event_time_frac: float = 0.5
    # moving-front correction: first-order image sources about the growing
    # layer's two material/void arc edges (trailing phi=0, leading phi=Phi),
    # enforcing approximate zero azimuthal flux at the fronts for events in
    # the incomplete layer.  Without it the modal basis (material everywhere)
    # leaks heat azimuthally into not-yet-deposited cells, an O(0.15*dT)
    # error at the freshest arc cells.
    front_images: bool = True

    @property
    def a(self) -> float:
        return self.r_inner

    @property
    def b(self) -> float:
        return self.r_inner + self.wall_thickness

    @property
    def alpha(self) -> float:
        return self.k / (self.rho * self.cp)

    @property
    def delta_T(self) -> float:
        return self.T_deposit - self.T_inf

    @property
    def z_front(self) -> float:
        return self.layer_height * self.n_layers

    @property
    def probe_r(self) -> float:
        if self.probe_radius is not None:
            return self.probe_radius
        return 0.5 * (self.a + self.b)


@dataclasses.dataclass
class SpiralModeCache:
    kappas: Dict[int, np.ndarray]        # m -> radial eigenvalues
    amp: Dict[int, np.ndarray]           # m -> P_n * R_n(probe) products
    events: List[Tuple[float, int, float]]  # (t_event, layer, phi_0)
    amplitudes: np.ndarray               # per-event deposit amplitude [K]
    phi_grid: np.ndarray
    z_grid: np.ndarray


def _robin_rows(m: int, kap: np.ndarray, r: float, gamma: float, sign: float):
    """(row_J, row_Y) of the Robin condition ``kap X' + sign*gamma X = 0``
    evaluated for X = J_m and Y_m at radius r."""
    J, Y = jv(m, kap * r), yv(m, kap * r)
    dJ, dY = jvp(m, kap * r, 1), yvp(m, kap * r, 1)
    return kap * dJ + sign * gamma * J, kap * dY + sign * gamma * Y


def _det(m: int, kap: np.ndarray, cfg: SpiralAnalyticConfig) -> np.ndarray:
    gi = cfg.h_inner / cfg.k
    go = cfg.h_outer / cfg.k
    Ra1, Ra2 = _robin_rows(m, kap, cfg.a, gi, sign=-1.0)  # inner: kR' - g R = 0
    Rb1, Rb2 = _robin_rows(m, kap, cfg.b, go, sign=+1.0)  # outer: kR' + g R = 0
    return Ra1 * Rb2 - Ra2 * Rb1


def _find_kappas(m: int, cfg: SpiralAnalyticConfig) -> np.ndarray:
    """Bracket-and-bisect the radial eigenvalues.  Roots of a thin annulus
    cluster near n*pi/(b-a), so scan up to (n_modes+2) of those."""
    kap_max = (cfg.n_radial_modes + 2) * np.pi / cfg.wall_thickness
    xs = np.linspace(1e-4, kap_max, max(20000, 400 * cfg.n_radial_modes))
    with np.errstate(all="ignore"):
        # Y_m overflows for kap*r << m; those samples come out NaN/inf and
        # are filtered below — only genuine finite sign changes are bracketed.
        vals = _det(m, xs, cfg)
    sgn = np.sign(vals)
    flips = np.nonzero((sgn[:-1] * sgn[1:] < 0) & np.isfinite(vals[:-1])
                       & np.isfinite(vals[1:]))[0]
    roots: List[float] = []
    for i in flips:
        try:
            r = optimize.brentq(lambda u: float(_det(m, np.asarray(u), cfg)),
                                xs[i], xs[i + 1], maxiter=200)
        except ValueError:
            continue
        if not roots or abs(r - roots[-1]) > 1e-9:
            roots.append(r)
            if len(roots) >= cfg.n_radial_modes:
                break
    return np.asarray(roots)


def _mode_amplitude(m: int, kap: float, cfg: SpiralAnalyticConfig) -> float:
    """P_n * R_n(probe_r) for the normalized mode: projection of a radially
    uniform unit deposit (P = int R r dr with int R^2 r dr = 1) evaluated at
    the probe radius."""
    gi = cfg.h_inner / cfg.k
    Ra1, Ra2 = _robin_rows(m, np.float64(kap), cfg.a, gi, sign=-1.0)
    B = 0.0 if abs(float(Ra2)) < 1e-14 else -float(Ra1) / float(Ra2)

    rs = np.linspace(cfg.a, cfg.b, 1024)
    Rv = jv(m, kap * rs) + B * yv(m, kap * rs)
    norm2 = np.trapezoid(Rv * Rv * rs, rs)
    scale = 1.0 / np.sqrt(max(norm2, 1e-300))
    P = np.trapezoid(Rv * rs, rs) * scale
    R_probe = scale * (jv(m, kap * cfg.probe_r) + B * yv(m, kap * cfg.probe_r))
    return float(P * R_probe)


def _build_events(cfg: SpiralAnalyticConfig) -> List[Tuple[float, int, float]]:
    """Arc-slice deposition events: slice p of layer L lands at
    t = L*tau + (p+event_time_frac)*tau/n_events, centred at
    phi_0 = 2 pi (p+1/2)/n_events."""
    events = []
    dt_slice = cfg.tau_dep / cfg.n_events_per_loop
    for layer in range(cfg.n_layers):
        for p in range(cfg.n_events_per_loop):
            t_evt = layer * cfg.tau_dep + (p + cfg.event_time_frac) * dt_slice
            phi0 = 2.0 * np.pi * (p + 0.5) / cfg.n_events_per_loop
            events.append((t_evt, layer, phi0))
    return events


def _z_profile(cfg: SpiralAnalyticConfig, s: np.ndarray, u: float,
               offset: float, dz_cell: float | None = None) -> np.ndarray:
    """Layer-thickness integral of the Robin half-space kernel at depths s.

    When ``cfg.cell_averaged_z`` and ``dz_cell`` are set, the profile is
    additionally averaged over each z cell (the numeric field stores cell
    averages), with depths clamped to the half-space s >= 0.
    """
    xi = np.linspace(0.0, cfg.layer_height, cfg.n_xi_quad)
    s = np.asarray(s, float)
    if cfg.cell_averaged_z and dz_cell is not None:
        off = (np.arange(cfg.n_z_avg) + 0.5) / cfg.n_z_avg - 0.5
        s_pts = np.maximum(s[:, None] + off[None, :] * dz_cell, 0.0)
        G = robin_halfspace_G(s_pts[:, :, None], xi[None, None, :] + offset,
                              u, cfg.alpha, cfg.h_end / cfg.k)
        return np.trapezoid(G, xi, axis=2).mean(axis=1)
    G = robin_halfspace_G(s[:, None], xi[None, :] + offset, u,
                          cfg.alpha, cfg.h_end / cfg.k)
    return np.trapezoid(G, xi, axis=1)


def _angular_profile(cfg: SpiralAnalyticConfig, kappas, amp, u: float,
                     phi_rel: np.ndarray) -> np.ndarray:
    """Fourier reconstruction of one arc event at angular offsets ``phi_rel``
    (phi - phi_0), including the radial mode decay and optional phi-cell
    averaging."""
    delta = 2.0 * np.pi / cfg.n_events_per_loop
    dphi_cell = 2.0 * np.pi / cfg.nphi
    ang = np.zeros_like(np.asarray(phi_rel, float))
    for m in range(cfg.m_max + 1):
        kl = kappas[m]
        if kl.size == 0:
            continue
        decay = np.exp(-cfg.alpha * kl * kl * u)
        radial = float(np.dot(amp[m], decay))
        if m == 0:
            ang += (delta / (2.0 * np.pi)) * radial
        else:
            w = (2.0 / (m * np.pi)) * np.sin(0.5 * m * delta)
            if cfg.cell_averaged_phi:
                x = 0.5 * m * dphi_cell
                w *= np.sin(x) / x
            ang += w * radial * np.cos(m * phi_rel)
    return ang


def _event_amplitudes(cfg: SpiralAnalyticConfig, kappas, amp,
                      events) -> np.ndarray:
    """Sequential deposit amplitudes with rebirth correction.

    Pure superposition of ``delta_T`` deposits double-counts heat near fresh
    cells: the quasi-static modal model lets older events' heat diffuse into
    not-yet-deposited regions, while physically a deposition *resets* the
    newborn cells to T_deposit.  Linearizing that reset, event e carries
    amplitude ``A_e = delta_T - theta_pre`` where ``theta_pre`` is the
    superposed pre-heat of all earlier events evaluated at e's own cell
    centre at its deposit time.  (The reference model omits this and can
    exceed T_deposit near the growth front.)
    """
    amps = np.zeros(len(events))
    for i, (t_e, layer_e, phi0_e) in enumerate(events):
        z_c = (layer_e + 0.5) * cfg.layer_height
        theta_pre = 0.0
        for j in range(i):
            t_p, layer_p, phi0_p = events[j]
            u = t_e - t_p
            if u <= 0.0:
                continue
            # per-event front = its own layer top (see the map evaluation)
            front = (layer_p + 1) * cfg.layer_height
            s = np.maximum(front - z_c, 0.0)
            zp = float(_z_profile(cfg, np.asarray([s]), u, 0.0,
                                  dz_cell=cfg.layer_height)[0])
            ang = float(_angular_profile(cfg, kappas, amp, u,
                                         np.asarray([phi0_e - phi0_p]))[0])
            theta_pre += amps[j] * zp * ang
        amps[i] = cfg.delta_T - theta_pre
    return amps


def build_mode_cache(cfg: SpiralAnalyticConfig) -> SpiralModeCache:
    kappas: Dict[int, np.ndarray] = {}
    amp: Dict[int, np.ndarray] = {}
    for m in range(cfg.m_max + 1):
        kl = _find_kappas(m, cfg)
        kappas[m] = kl
        amp[m] = np.asarray([_mode_amplitude(m, k, cfg) for k in kl])
    if cfg.cell_averaged_phi:
        # column centres of the numeric phi cells
        phi_grid = (np.arange(cfg.nphi) + 0.5) * (2.0 * np.pi / cfg.nphi)
    else:
        phi_grid = np.linspace(0.0, 2.0 * np.pi, cfg.nphi, endpoint=False)
    if cfg.cell_centered_z:
        dz = (cfg.z_back + cfg.z_front) / cfg.nz
        z_grid = -cfg.z_back + (np.arange(cfg.nz) + 0.5) * dz
    else:
        z_grid = np.linspace(-cfg.z_back, cfg.z_front, cfg.nz)
    events = _build_events(cfg)
    amplitudes = _event_amplitudes(cfg, kappas, amp, events)
    return SpiralModeCache(kappas, amp, events, amplitudes, phi_grid, z_grid)




def temperature_map_at_probe(cfg: SpiralAnalyticConfig, cache: SpiralModeCache,
                             t: float) -> Tuple[np.ndarray, float, float]:
    """Analytic temperature at ``cfg.probe_r`` on the (z, phi) grid at time t.

    Returns (T_map[nz, nphi] with NaN in void, front height L_full,
    angular progress of the growing layer in [0, 2 pi)).
    """
    nz, nphi = cfg.nz, cfg.nphi
    T_map = np.full((nz, nphi), np.nan)

    full_layers = min(cfg.n_layers, int(np.floor(t / cfg.tau_dep)))
    L_full = full_layers * cfg.layer_height
    frac = 0.0
    if full_layers < cfg.n_layers:
        frac = min(1.0, max(0.0, (t - full_layers * cfg.tau_dep) / cfg.tau_dep))
    phi_progress = 2.0 * np.pi * frac

    z = cache.z_grid
    phi = cache.phi_grid
    dphi_cell = 2.0 * np.pi / nphi
    exist = np.zeros((nz, nphi), bool)
    exist[(z <= L_full) & (z >= -cfg.z_back), :] = True
    if full_layers < cfg.n_layers and frac > 0.0:
        band = (z >= L_full) & (z <= L_full + cfg.layer_height)
        # a phi column exists once the nozzle swept past its leading edge
        lead = phi - 0.5 * dphi_cell if cfg.cell_averaged_phi else phi
        exist[band, :] |= (lead[None, :] < phi_progress)

    rows = np.nonzero(exist.any(axis=1))[0]
    if rows.size == 0:
        return T_map + cfg.T_inf, L_full, phi_progress

    # rows inside the growing (incomplete) band, where the moving-front
    # image correction applies
    band_rows = np.zeros(rows.size, bool)
    growing = full_layers < cfg.n_layers and 0.0 < frac < 1.0
    if growing:
        band_rows = (z[rows] >= L_full) & (z[rows] <= L_full + cfg.layer_height)

    theta = np.zeros((rows.size, nphi))
    for (t_evt, layer, phi0), A_e in zip(cache.events, cache.amplitudes):
        u = t - t_evt
        if u <= 0.0:
            continue
        if layer == full_layers and phi0 > phi_progress:
            continue
        if layer > full_layers:
            continue
        # Quasi-static front for this event: its OWN layer top — the surface
        # whose (nearly reflecting) Robin pile-up shaped its z-profile while
        # it was the top layer; diffusion is too slow (sqrt(alpha*tau) ~
        # layer height) to redistribute that pile-up after coverage.  Rows
        # above (deposited later) clamp to the front value s = 0.
        front = (layer + 1) * cfg.layer_height
        s = np.maximum(front - z[rows], 0.0)

        dz_cell = (cfg.z_back + cfg.z_front) / cfg.nz if cfg.cell_centered_z else None
        z_prof = _z_profile(cfg, s, u, 0.0, dz_cell=dz_cell)
        ang = _angular_profile(cfg, cache.kappas, cache.amp, u, phi - phi0)
        if (cfg.front_images and cfg.n_events_per_loop > 1 and growing
                and layer == full_layers):
            # Within the growing band, material spans the arc [0, Phi] only:
            # add image sources about both arc edges (zero-flux fronts);
            # below the band the ring is complete, the plain profile stands.
            # The images fade as the void gap 2pi - Phi closes: the periodic
            # basis aliases 2*Phi-reflections back onto the trailing image
            # once the ring is (nearly) closed, and physically the fronts
            # cease to exist.
            gap = 2.0 * np.pi - phi_progress
            delta = 2.0 * np.pi / cfg.n_events_per_loop
            w = min(1.0, max(0.0, gap / (2.0 * delta)))
            ang_img = (ang
                       + w * _angular_profile(cfg, cache.kappas, cache.amp, u,
                                              phi + phi0)
                       + w * _angular_profile(cfg, cache.kappas, cache.amp, u,
                                              phi + phi0 - 2.0 * phi_progress))
            theta[band_rows] += (A_e * z_prof[band_rows, None]
                                 * ang_img[None, :])
            theta[~band_rows] += (A_e * z_prof[~band_rows, None]
                                  * ang[None, :])
        else:
            theta += A_e * z_prof[:, None] * ang[None, :]

    T_map[rows, :] = np.where(exist[rows, :], cfg.T_inf + theta, np.nan)
    return T_map, L_full, phi_progress
