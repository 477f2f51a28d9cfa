"""North-star oracle tests: masked cylindrical deposition vs the analytic
modal solution (reference tests/test_spiral_vs_analytic.py semantics).

Reference-parity notes (documented deviations):

* The reference test cannot run as checked in — it builds an annular grid via
  ``GridCyl(..., R_in=...)`` which its ``GridCyl`` does not accept
  (quick_spiral_deposition_gif_v5.py:80 vs adi3d_cyl_phi_v3.py:34).  The
  geometry, schedule, material data, probe, and the mean tolerance (60 C)
  here match the reference test (tests/test_spiral_vs_analytic.py:123-209).
* The numeric solver here applies true Robin h at material/void interfaces
  (step/cylindrical_masked.py) instead of the reference's ambient clamping,
  which is the only treatment consistent with the analytic oracle's Robin
  growth front.
* The oracle carries a moving-front correction the reference model lacks
  (analytic/spiral.py): image sources about the growing layer's arc edges
  (fading as the ring closes) stop the modal basis leaking heat azimuthally
  into not-yet-deposited cells, and each event's z-front is its own layer
  top (the reflecting surface whose pile-up shaped its profile).  This
  restores the reference's max < 120 C tolerance on the spiral test proper
  (measured: <= 94 C; without the correction the fresh-arc-cell error is
  ~0.15 * delta_T ~ 156 C).  The azimuthally-clean ring test keeps its
  tighter bounds (measured: max <= 54 C).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adi_thermal_fields_tpu import CylindricalGrid, Material, RobinBC, ZFaceBC
from adi_thermal_fields_tpu.analytic.spiral import (SpiralAnalyticConfig,
                                                    build_mode_cache,
                                                    temperature_map_at_probe)
from adi_thermal_fields_tpu.birth.spiral import (active_at, newborn_between,
                                                 ring_activation_times,
                                                 spiral_activation_times)
from adi_thermal_fields_tpu.step.cylindrical_masked import adi_step_masked_robin

# heavy tier (spiral/ring oracle fits): excluded from scripts/test.sh --smoke
pytestmark = pytest.mark.full

# Shared physics (reference tests/test_spiral_vs_analytic.py:124-139)
K, RHO, CP = 54.0, 7800.0, 490.0
T_INF, T_DEP = 20.0, 900.0
R_IN, WALL = 0.03, 0.002
H_SIDE, H_END = 400.0, 500.0
Z_BACK, LAYER_H, N_LAYERS, TAU = 0.02, 0.004, 2, 2.0


def _simulate(act_times, grid, dt, times):
    mat = Material(RHO, CP, K)
    rob = RobinBC(H_SIDE, T_INF)
    zbc = ZFaceBC(kind_bot="neumann0", kind_top="robin", h_top=H_END,
                  T_inf_top=T_INF)

    @jax.jit
    def step(T, active, dt_):
        a3 = jnp.broadcast_to(active[None, :, :], grid.shape)
        return adi_step_masked_robin(T, grid, mat, dt=dt_, active=a3,
                                     robin_outer=rob, zbc=zbc, robin_inner=rob,
                                     h_void=H_SIDE, T_inf_void=T_INF,
                                     h_front=H_END)

    act_t = jnp.asarray(act_times)
    T = jnp.full(grid.shape, T_INF, jnp.float64)
    t = 0.0
    snaps, acts = [], []
    for t_target in times:
        while t < t_target - 1e-12:
            t_next = min(t + dt, t_target)
            newborn = newborn_between(act_t, t, t_next)
            T = jnp.where(newborn[None, :, :], T_DEP, T)
            active = active_at(act_t, t_next)
            T = step(T, active, t_next - t)
            t = t_next
        snaps.append(np.asarray(T))
        acts.append(np.asarray(active_at(act_t, t + 1e-12)))
    return snaps, acts


def _compare(grid, cfg, snaps, acts, times, mean_tol, max_tol):
    cache = build_mode_cache(cfg)
    ir = int(np.abs(np.asarray(grid.r) - cfg.probe_r).argmin())
    checked = 0
    for t_s, T_snap, act in zip(times, snaps, acts):
        T_ana, _, _ = temperature_map_at_probe(cfg, cache, float(t_s))
        num_map = T_snap[ir].T
        act_map = np.broadcast_to(act.T, (grid.nz, grid.nphi))
        valid = np.isfinite(T_ana) & act_map
        if not valid.any():
            continue
        diff = np.abs(num_map - T_ana)
        mean_err = float(np.nanmean(diff[valid]))
        max_err = float(np.nanmax(diff[valid]))
        assert mean_err < mean_tol, f"mean {mean_err:.1f} C at t={t_s:.2f}s"
        assert max_err < max_tol, f"max {max_err:.1f} C at t={t_s:.2f}s"
        checked += 1
    assert checked >= 4


@pytest.mark.slow
def test_spiral_numeric_matches_analytic():
    """Spiral arc-by-arc deposition (reference north-star test geometry)."""
    nphi, nr = 36, 6
    dt = TAU / nphi
    dr, dz = WALL / nr, LAYER_H
    nz = int(round((Z_BACK + LAYER_H * N_LAYERS) / dz))
    grid = CylindricalGrid(nr, nphi, nz, dr, dz, r_inner=R_IN)
    iz_base = int(round(Z_BACK / dz))
    act = spiral_activation_times(grid, iz_base=iz_base, layer_cells=1,
                                  n_layers=N_LAYERS, tau_dep=TAU)
    times = np.linspace(0.0, TAU * N_LAYERS, 5)
    snaps, acts = _simulate(act, grid, dt, times)

    cfg = SpiralAnalyticConfig(k=K, rho=RHO, cp=CP, T_inf=T_INF, T_deposit=T_DEP,
                               r_inner=R_IN, wall_thickness=WALL, h_inner=H_SIDE,
                               h_outer=H_SIDE, h_end=H_END, layer_height=LAYER_H,
                               n_layers=N_LAYERS, tau_dep=TAU,
                               n_events_per_loop=nphi, z_back=Z_BACK,
                               nz=nz, nphi=nphi, m_max=48, n_radial_modes=6)
    _compare(grid, cfg, snaps, acts, times, mean_tol=60.0, max_tol=120.0)


def test_ring_deposition_matches_analytic_axisymmetric():
    """Instant full-ring layers: no azimuthal front, so the modal oracle is
    clean and the tolerances tight (r-Robin, z-Robin, front-Robin, element
    birth, and the rebirth amplitude correction all in play)."""
    nphi, nr, layer_cells = 4, 6, 2
    dt = TAU / 36
    dr, dz = WALL / nr, LAYER_H / layer_cells
    nz = int(round((Z_BACK + LAYER_H * N_LAYERS) / dz))
    grid = CylindricalGrid(nr, nphi, nz, dr, dz, r_inner=R_IN)
    iz_base = int(round(Z_BACK / dz))
    act = ring_activation_times(grid, iz_base=iz_base, layer_cells=layer_cells,
                                n_layers=N_LAYERS, tau_per_layer=TAU)
    times = np.linspace(0.0, TAU * N_LAYERS, 5)
    snaps, acts = _simulate(act, grid, dt, times)

    cfg = SpiralAnalyticConfig(k=K, rho=RHO, cp=CP, T_inf=T_INF, T_deposit=T_DEP,
                               r_inner=R_IN, wall_thickness=WALL, h_inner=H_SIDE,
                               h_outer=H_SIDE, h_end=H_END, layer_height=LAYER_H,
                               n_layers=N_LAYERS, tau_dep=TAU,
                               n_events_per_loop=1, z_back=Z_BACK,
                               nz=nz, nphi=nphi, m_max=0, n_radial_modes=6,
                               event_time_frac=0.0)
    _compare(grid, cfg, snaps, acts, times, mean_tol=45.0, max_tol=75.0)
