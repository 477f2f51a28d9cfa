"""Pytest ports of the reference quick_compare end-face validation drivers.

Each case: a voxelized cylinder (radius R, masked Cartesian grid) with side
Robin convection, heated at z=0; the numeric axis profile is compared against
the closed-form modal solution.  The reference ran these as manual
plot-producing scripts (quick_compare_dirichlet_robin.py,
quick_compare_neumann_robin.py, quick_compare_robin_end_robin.py); here they
are automated with numeric tolerances at a reduced resolution (nxr=16).

Tolerance note: the voxelized cylinder's staircase boundary overestimates the
lateral surface (digital perimeter ~ 4/pi of the true one), so the numeric
solution cools slightly faster than the analytic one; tolerances account for
this discretization bias at nxr=16.  The perimeter-corrected variant is
exercised in test_layer_birth (geometry/perimeter.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adi_thermal_fields_tpu import (CartesianGrid, Material, adi_step_cartesian,
                                    build_coeff_packs)
from adi_thermal_fields_tpu.analytic.endface import (EndFaceProblem,
                                                     dirichlet_end_profile,
                                                     neumann_end_profile,
                                                     robin_end_profile)

# heavy tier (analytic end-face oracle fits): excluded from
# scripts/test.sh --smoke
pytestmark = pytest.mark.full

K, RHO, CP = 54.0, 7800.0, 490.0
T_INF = 20.0
R = 0.02
H_SIDE = 500.0
NXR = 16
NZ = 48
CFL = 0.5


def _cylinder_setup():
    dx = R / NXR
    nx = ny = int(round(2 * R / dx))
    grid = CartesianGrid(nx, ny, NZ, dx)
    mat = Material(RHO, CP, K)
    cx, cy = nx / 2.0, ny / 2.0
    xs = (np.arange(nx) + 0.5 - cx) * dx
    ys = (np.arange(ny) + 0.5 - cy) * dx
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    mask2d = np.sqrt(X ** 2 + Y ** 2) <= R + 1e-12
    mask = np.repeat(mask2d[:, :, None], NZ, axis=2)
    return grid, mat, jnp.asarray(mask), dx


def _run_numeric(grid, mat, mask, packs, times, dx, theta=0.5):
    alpha = mat.alpha
    dt_cap = CFL * dx * dx / alpha

    @jax.jit
    def step(T, dt):
        return adi_step_cartesian(T, mask, packs, grid, mat, dt=dt,
                                  theta=theta, t_inf=T_INF)

    T = jnp.full(grid.shape, T_INF, jnp.float64)
    t_cur = 0.0
    axis_profiles = []
    i0, j0 = grid.nx // 2, grid.ny // 2
    for tt in times:
        remain = float(tt - t_cur)
        nsub = max(1, int(np.ceil(remain / dt_cap)))
        dt = remain / nsub
        for _ in range(nsub):
            T = step(T, dt)
        t_cur = tt
        axis_profiles.append(np.asarray(T[i0, j0, :]))
    return axis_profiles


def _check(profiles_num, profiles_ana, z, zmax_frac=0.7, rtol_of_delta=0.08,
           delta=1.0):
    """Compare axis profiles over the lower part of the rod (away from the
    artificial top Dirichlet lid), as a fraction of the driving Delta."""
    sel = z < zmax_frac * z[-1]
    for num, ana in zip(profiles_num, profiles_ana):
        err = np.max(np.abs(num[sel] - ana[sel]))
        assert err < rtol_of_delta * abs(delta), f"axis error {err:.2f}"


def test_dirichlet_end_step():
    grid, mat, mask, dx = _cylinder_setup()
    Ts, Delta = 1000.0, 980.0
    dir_mask = np.zeros(grid.shape, bool)
    dir_mask[:, :, 0] = np.asarray(mask)[:, :, 0]
    dir_mask[:, :, -1] = np.asarray(mask)[:, :, -1]
    dir_val = np.full(grid.shape, T_INF)
    dir_val[:, :, 0] = Ts
    packs = build_coeff_packs(mask, grid, mat,
                              robin_h={"x-": H_SIDE, "x+": H_SIDE,
                                       "y-": H_SIDE, "y+": H_SIDE},
                              dirichlet_mask=jnp.asarray(dir_mask),
                              dirichlet_value=jnp.asarray(dir_val))
    times = [0.5, 1.0, 2.0]
    nums = _run_numeric(grid, mat, mask, packs, times, dx)

    p = EndFaceProblem(K, RHO, CP, R, H_SIDE, T_INF)
    # The numeric scheme pins the first cell ROW (center z = dx/2), so the
    # effective Dirichlet boundary is at dx/2 — shift the analytic origin.
    z = (np.arange(NZ) + 0.5) * dx
    z_eff = z - 0.5 * dx
    anas = [dirichlet_end_profile(p, Delta, z_eff, t) for t in times]
    _check(nums, anas, z, delta=Delta)


def test_neumann_end_flux():
    grid, mat, mask, dx = _cylinder_setup()
    q0 = 2e5  # W/m^2 heating
    dir_mask = np.zeros(grid.shape, bool)
    dir_mask[:, :, -1] = np.asarray(mask)[:, :, -1]
    packs = build_coeff_packs(mask, grid, mat,
                              neumann={"z-": q0},
                              robin_h={"x-": H_SIDE, "x+": H_SIDE,
                                       "y-": H_SIDE, "y+": H_SIDE},
                              dirichlet_mask=jnp.asarray(dir_mask),
                              dirichlet_value=T_INF)
    times = [0.5, 1.0, 2.0]
    nums = _run_numeric(grid, mat, mask, packs, times, dx)

    p = EndFaceProblem(K, RHO, CP, R, H_SIDE, T_INF)
    z = (np.arange(NZ) + 0.5) * dx
    anas = [neumann_end_profile(p, q0, z, t) for t in times]
    # scale tolerance by the surface temperature rise
    delta = float(anas[-1][0] - T_INF)
    _check(nums, anas, z, delta=delta)


def test_robin_end_step():
    """Robin end at hotter ambient, realized (as in the reference,
    quick_compare_robin_end_robin.py:144-156) as Robin at the global ambient
    plus the equivalent extra Neumann flux h_end*Delta."""
    grid, mat, mask, dx = _cylinder_setup()
    h_end, Delta = 800.0, 500.0
    q_add = h_end * Delta
    dir_mask = np.zeros(grid.shape, bool)
    dir_mask[:, :, -1] = np.asarray(mask)[:, :, -1]
    packs = build_coeff_packs(mask, grid, mat,
                              neumann={"z-": q_add},
                              robin_h={"x-": H_SIDE, "x+": H_SIDE,
                                       "y-": H_SIDE, "y+": H_SIDE,
                                       "z-": h_end},
                              dirichlet_mask=jnp.asarray(dir_mask),
                              dirichlet_value=T_INF)
    times = [0.5, 1.0, 2.0]
    nums = _run_numeric(grid, mat, mask, packs, times, dx)

    p = EndFaceProblem(K, RHO, CP, R, H_SIDE, T_INF)
    z = (np.arange(NZ) + 0.5) * dx
    anas = [robin_end_profile(p, h_end, Delta, z, t) for t in times]
    _check(nums, anas, z, delta=Delta)


def test_robin_end_with_stl_corrected_lateral_fields():
    """The reference's corrected-BC validation
    (quick_compare_robin_end_robin_corrected.py): the Robin end-step problem
    solved with STL projected-area-corrected lateral h fields, composed with
    the per-slice perimeter scale (total-area fix), must still match the
    analytic solution."""
    from adi_thermal_fields_tpu.geometry.bc_correction import corrected_robin_fields
    from adi_thermal_fields_tpu.geometry.primitives import cylinder_mesh
    from adi_thermal_fields_tpu.geometry.slices import per_slice_perimeter_scale
    from adi_thermal_fields_tpu.geometry.voxelize import voxelize_solid

    grid, mat, mask, dx = _cylinder_setup()
    mesh = cylinder_mesh(R, NZ * dx, center=(0, 0, NZ * dx / 2), n_phi=256)
    # voxelize onto the oracle's own grid (origin at the domain corner)
    origin = np.array([-grid.nx / 2 * dx, -grid.ny / 2 * dx, 0.0])
    mask_np, _ = voxelize_solid(mesh, dx, origin=origin, dims=grid.shape)
    mask = jnp.asarray(mask_np)

    base = {f: H_SIDE for f in ("x-", "x+", "y-", "y+")}
    fields, _scales = corrected_robin_fields(mesh, mask_np, origin, dx, base)
    gamma = per_slice_perimeter_scale(mesh, mask_np, origin, dx)
    # compose: per-face redistribution * per-slice total correction
    robin_h = {f: jnp.asarray(v * gamma[None, None, :])
               for f, v in fields.items()}

    h_end, Delta = 800.0, 500.0
    dir_mask = np.zeros(grid.shape, bool)
    dir_mask[:, :, -1] = np.asarray(mask)[:, :, -1]
    packs = build_coeff_packs(mask, grid, mat,
                              neumann={"z-": h_end * Delta},
                              robin_h={**robin_h, "z-": h_end},
                              dirichlet_mask=jnp.asarray(dir_mask),
                              dirichlet_value=T_INF)
    times = [0.5, 1.0, 2.0]
    nums = _run_numeric(grid, mat, mask, packs, times, dx)

    p = EndFaceProblem(K, RHO, CP, R, H_SIDE, T_INF)
    z = (np.arange(NZ) + 0.5) * dx
    anas = [robin_end_profile(p, h_end, Delta, z, t) for t in times]
    _check(nums, anas, z, delta=Delta)
