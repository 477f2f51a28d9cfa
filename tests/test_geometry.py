"""Geometry pipeline tests: STL I/O, voxelization, morphology, BC correction.

Replaces trimesh-based reference components with native equivalents
(stl_utils.py, waam_from_stl_v7_mm.py:218-318, voxel_bc_correction.py) and
ports the grid-convergence validation of the projected-area correction
(quick_compare_robin_correction_gridconv.py semantics).
"""
import numpy as np
import pytest

from adi_thermal_fields_tpu.geometry.bc_correction import (
    corrected_robin_fields, voxel_projected_areas)
from adi_thermal_fields_tpu.geometry.morphology import (closing6, dilate6,
                                                        erode6, fill_enclosed,
                                                        flood_fill_outside,
                                                        solidify_mask)
from adi_thermal_fields_tpu.geometry.perimeter import digital_perimeter
from adi_thermal_fields_tpu.geometry.primitives import (box_mesh,
                                                        cylinder_mesh,
                                                        uv_sphere_mesh)
from adi_thermal_fields_tpu.geometry.stl import load_stl, save_stl_binary
from adi_thermal_fields_tpu.geometry.voxelize import (auto_cell_size,
                                                      voxelize_shell,
                                                      voxelize_solid)


def test_stl_roundtrip(tmp_path):
    mesh = box_mesh(size=(0.01, 0.02, 0.03))
    path = tmp_path / "box.stl"
    save_stl_binary(str(path), mesh)
    loaded = load_stl(str(path), units="m")
    assert loaded.n_faces == 12
    np.testing.assert_allclose(np.sort(loaded.triangles.ravel()),
                               np.sort(mesh.triangles.ravel()), atol=1e-7)
    np.testing.assert_allclose(loaded.face_areas.sum(),
                               2 * (0.01 * 0.02 + 0.02 * 0.03 + 0.01 * 0.03),
                               rtol=1e-5)


def test_stl_mm_autoscale(tmp_path):
    mesh = box_mesh(size=(10.0, 10.0, 10.0))  # "mm" box
    path = tmp_path / "box_mm.stl"
    save_stl_binary(str(path), mesh)
    loaded = load_stl(str(path), units="auto")
    np.testing.assert_allclose(loaded.extents, 0.01, rtol=1e-5)


def test_box_normals_point_outward():
    mesh = box_mesh(size=(2.0, 2.0, 2.0))
    out = np.einsum("ij,ij->i", mesh.face_normals, mesh.centroids)
    assert (out > 0).all()


def test_voxelize_solid_box_volume():
    mesh = box_mesh(size=(0.010, 0.010, 0.010), center=(0.005, 0.005, 0.005))
    dx = 1e-3
    mask, origin = voxelize_solid(mesh, dx)
    vol = mask.sum() * dx ** 3
    np.testing.assert_allclose(vol, 1e-6, rtol=0.05)


def test_voxelize_solid_sphere_volume():
    R = 0.01
    mesh = uv_sphere_mesh(R, n_theta=48, n_phi=96)
    dx = 1e-3
    mask, origin = voxelize_solid(mesh, dx)
    vol = mask.sum() * dx ** 3
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * R ** 3, rtol=0.05)
    # watertight: no outside air inside
    assert not (fill_enclosed(mask) & ~mask).any()


def test_voxelize_shell_then_solidify_matches_solid():
    R = 0.01
    mesh = uv_sphere_mesh(R, n_theta=48, n_phi=96)
    dx = 1e-3
    shell, origin = voxelize_shell(mesh, dx)
    solid = solidify_mask(shell, mode="fill")
    ref, _ = voxelize_solid(mesh, dx, origin=origin, dims=shell.shape)
    # the filled shell contains the parity solid and is at most one cell fatter
    assert (solid | ref).sum() <= solid.sum() + 0.02 * ref.sum()
    assert (ref & ~solid).mean() < 0.02
    vol_ratio = solid.sum() / ref.sum()
    assert 0.95 < vol_ratio < 1.45  # shell adds a surface layer


def test_morphology_basics():
    m = np.zeros((5, 5, 5), bool)
    m[2, 2, 2] = True
    d = dilate6(m)
    assert d.sum() == 7
    assert erode6(d).sum() == 1
    assert (closing6(d) == d).all()


def test_flood_fill_and_cavity():
    box = np.zeros((8, 8, 8), bool)
    box[1:7, 1:7, 1:7] = True
    box[3:5, 3:5, 3:5] = False  # internal cavity
    outside = flood_fill_outside(box)
    assert not outside[3, 3, 3]      # cavity is not outside
    assert outside[0, 0, 0]
    filled = fill_enclosed(box)
    assert filled[3, 3, 3]
    assert filled.sum() == 6 ** 3


def test_solidify_auto_on_shell():
    shell = np.zeros((10, 10, 10), bool)
    shell[2:8, 2:8, 2:8] = True
    shell[3:7, 3:7, 3:7] = False  # hollow box (watertight shell)
    solid = solidify_mask(shell, mode="auto")
    assert solid[5, 5, 5]
    assert solid.sum() == 6 ** 3


def test_auto_cell_size_budget():
    mesh = box_mesh(size=(0.1, 0.1, 0.1))
    dx = auto_cell_size(mesh, 1e-4, max_voxels=100_000)
    n = np.prod(np.ceil(mesh.extents / dx))
    assert n <= 100_000


def test_projected_area_sphere_total():
    """Summed projected areas over all 6 face buckets ~ integral of |n| over
    the sphere = surface area * mean(|nx|+|ny|+|nz|) = 4 pi R^2 * (3/2)/...
    — instead assert each direction pair sums to the great-circle silhouette
    area pi R^2 (projection theorem for convex bodies)."""
    R = 0.01
    mesh = uv_sphere_mesh(R, n_theta=64, n_phi=128)
    dx = 1e-3
    mask, origin = voxelize_solid(mesh, dx)
    proj = voxel_projected_areas(mesh, mask, origin, dx)
    for pair in (("x-", "x+"), ("y-", "y+"), ("z-", "z+")):
        tot = proj[pair[0]].sum() + proj[pair[1]].sum()
        np.testing.assert_allclose(tot, 2 * np.pi * R ** 2, rtol=0.06)


def test_corrected_robin_matches_exact_projections_cylinder():
    """Grid-convergence check (quick_compare_robin_correction_gridconv
    semantics): the corrected per-direction area sums must match the exact
    analytic projections of the cylinder's lateral surface
    (``int |n.x| dA = 4 R H`` per x/y direction pair), and the per-cell h
    must track the local surface obliquity (small where the surface is
    parallel to the face), unlike the all-or-nothing staircase exposure.

    Note the sum of ALL per-face projections equals the digital staircase
    area identically (projection theorem) — this corrector redistributes h
    over faces to the true projected areas; the separate perimeter/area
    scaling (geometry/perimeter.py, validated in test_layer_birth) fixes the
    staircase total.
    """
    R, H = 0.02, 0.04
    mesh = cylinder_mesh(R, H, center=(0, 0, H / 2), n_phi=128)
    for nxr in (8, 16):
        dx = R / nxr
        mask, origin = voxelize_solid(mesh, dx)
        base_h = {f: 1.0 for f in ("x-", "x+", "y-", "y+")}
        robin, scale = corrected_robin_fields(mesh, mask, origin, dx, base_h,
                                              fallback_to_base=False)
        for pair in (("x-", "x+"), ("y-", "y+")):
            tot = (robin[pair[0]].sum() + robin[pair[1]].sum()) * dx * dx
            np.testing.assert_allclose(tot, 4 * R * H, rtol=0.08)
        # obliquity: x+ faces near phi ~ 90 deg (surface parallel to x) carry
        # much less h than faces near phi ~ 0 (surface perpendicular to x)
        nx, ny, nz = mask.shape
        mid = nz // 2
        h_x = robin["x+"][:, :, mid]
        front = h_x[:, ny // 2 - 1: ny // 2 + 1].max()   # phi ~ 0: n || x
        side_col = h_x[nx // 2 - 1: nx // 2 + 1, :]      # phi ~ 90: n perp x
        assert front > 0.85, front
        assert side_col.max() < 0.6 * front, (side_col.max(), front)


def test_digital_perimeter_square():
    m = np.zeros((10, 10), bool)
    m[2:8, 2:8] = True
    assert digital_perimeter(m, 1.0) == 24.0


def test_slice_perimeter_area_cylinder_and_box():
    from adi_thermal_fields_tpu.geometry.slices import slice_perimeter_area

    R, H = 0.02, 0.04
    mesh = cylinder_mesh(R, H, center=(0, 0, H / 2), n_phi=256)
    p, a = slice_perimeter_area(mesh, 0.02)
    np.testing.assert_allclose(p, 2 * np.pi * R, rtol=1e-3)
    np.testing.assert_allclose(a, np.pi * R * R, rtol=1e-3)
    b = box_mesh(size=(0.01, 0.02, 0.03), center=(0, 0, 0.015))
    p2, a2 = slice_perimeter_area(b, 0.01)
    np.testing.assert_allclose(p2, 0.06, rtol=1e-9)
    np.testing.assert_allclose(a2, 2e-4, rtol=1e-9)
    # empty section above the solid
    p3, a3 = slice_perimeter_area(b, 1.0)
    assert p3 == 0.0 and a3 == 0.0


def test_per_slice_perimeter_scale_cylinder():
    from adi_thermal_fields_tpu.geometry.slices import per_slice_perimeter_scale

    R, H = 0.02, 0.04
    mesh = cylinder_mesh(R, H, center=(0, 0, H / 2), n_phi=256)
    mask, org = voxelize_solid(mesh, R / 12)
    sc = per_slice_perimeter_scale(mesh, mask, org, R / 12)
    mid = sc[mask.any(axis=(0, 1))]
    np.testing.assert_allclose(mid[1:-1], np.pi / 4, rtol=0.02)


def _cone_mesh(R=0.02, H=0.05, tilt=0.4, n_phi=128):
    """Tilted cone: apex above the base center, then rotated about y."""
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    base = np.stack([R * np.cos(ph), R * np.sin(ph), np.zeros_like(ph)], 1)
    apex = np.array([0.0, 0.0, H])
    b2 = np.roll(base, -1, axis=0)
    c0 = np.zeros(3)
    side = np.stack([base, b2, np.broadcast_to(apex, base.shape)], axis=1)
    cap = np.stack([np.broadcast_to(c0, base.shape), b2, base], axis=1)
    tris = np.concatenate([side, cap])
    # rotate about y by `tilt`, then lift above z=0
    cs, sn = np.cos(tilt), np.sin(tilt)
    Rm = np.array([[cs, 0, sn], [0, 1, 0], [-sn, 0, cs]])
    tris = tris @ Rm.T
    tris[:, :, 2] -= tris[:, :, 2].min() - 0.001
    from adi_thermal_fields_tpu.geometry.stl import TriMesh
    return TriMesh(tris)


def test_corrected_projections_tilted_cone_converge():
    """Port of quick_compare_robin_correction_surface_complex.py: for an
    arbitrary tilted body, the voxel-accumulated per-direction projected
    areas must converge to the triangle-exact projections
    ``sum_t max(n_t . e_f, 0) A_t`` as dx shrinks."""
    mesh = _cone_mesh()
    n = mesh.face_normals
    A = mesh.face_areas
    exact = {}
    for f, (ax, sg) in {"x-": (0, -1), "x+": (0, 1), "y-": (1, -1),
                        "y+": (1, 1), "z-": (2, -1), "z+": (2, 1)}.items():
        exact[f] = float(np.sum(np.maximum(sg * n[:, ax], 0.0) * A))

    errs = []
    for dx in (2e-3, 1e-3):
        mask, origin = voxelize_solid(mesh, dx)
        proj = voxel_projected_areas(mesh, mask, origin, dx)
        err = max(abs(proj[f].sum() - exact[f]) / max(exact[f], 1e-12)
                  for f in exact)
        errs.append(err)
    assert errs[0] < 0.08, errs
    assert errs[1] < 0.05, errs
    assert errs[1] <= errs[0] + 0.005  # converging


def test_corrected_projections_anisotropic_voxels():
    """Anisotropic (dz != dx) voxels: per-direction projected-area sums
    still converge to the triangle-exact projections, and the h scaling
    normalizes by each direction's TRUE voxel-face area (dy*dz / dx*dz /
    dx*dy) — the reference's single dx^2 (voxel_bc_correction.py:170-182)
    generalized so --corrected_bc composes with --dz_mm."""
    mesh = _cone_mesh()
    n = mesh.face_normals
    A = mesh.face_areas
    exact = {}
    for f, (ax, sg) in {"x-": (0, -1), "x+": (0, 1), "y-": (1, -1),
                        "y+": (1, 1), "z-": (2, -1), "z+": (2, 1)}.items():
        exact[f] = float(np.sum(np.maximum(sg * n[:, ax], 0.0) * A))
    d = (1e-3, 1e-3, 0.5e-3)
    mask, origin = voxelize_solid(mesh, d)
    proj = voxel_projected_areas(mesh, mask, origin, d)
    err = max(abs(proj[f].sum() - exact[f]) / max(exact[f], 1e-12)
              for f in exact)
    assert err < 0.06, err

    # flat box: summed scale * per-face voxel area must recover each flat
    # face's true area — with the old dx^2 normalization the x/y sums would
    # be off by exactly dz/dx = 0.5
    L = (0.02, 0.016, 0.012)
    box = box_mesh(size=L, center=tuple(v / 2 for v in L))
    maskb, ob = voxelize_solid(box, d)
    base_h = {f: 1.0 for f in ("x-", "x+", "y-", "y+", "z-", "z+")}
    _, scale = corrected_robin_fields(box, maskb, ob, d, base_h,
                                      fallback_to_base=False)
    areas = {"x+": (L[1] * L[2], d[1] * d[2]),
             "y+": (L[0] * L[2], d[0] * d[2]),
             "z+": (L[0] * L[1], d[0] * d[1])}
    for f, (true_area, face_area) in areas.items():
        np.testing.assert_allclose(scale[f].sum() * face_area, true_area,
                                   rtol=0.02, err_msg=f)


@pytest.mark.slow
def test_corrected_robin_gridconv_nxr32():
    """Reference-breadth grid convergence (quick_compare_robin_correction_
    gridconv.py:143-200): cylinder resolution sweep to nxr=32 — corrected
    per-direction area sums converge to the exact lateral projections
    (4 R H per x/y pair) with monotonically improving error."""
    R, H = 0.02, 0.04
    mesh = cylinder_mesh(R, H, center=(0, 0, H / 2), n_phi=256)
    errs = []
    for nxr in (8, 16, 32):
        dx = R / nxr
        mask, origin = voxelize_solid(mesh, dx)
        base_h = {f: 1.0 for f in ("x-", "x+", "y-", "y+")}
        robin, _ = corrected_robin_fields(mesh, mask, origin, dx, base_h,
                                          fallback_to_base=False)
        err = max(
            abs((robin[p0].sum() + robin[p1].sum()) * dx * dx - 4 * R * H)
            / (4 * R * H)
            for p0, p1 in (("x-", "x+"), ("y-", "y+")))
        errs.append(err)
    assert errs[-1] < 0.03, errs
    assert errs[2] <= errs[0] + 0.005, errs


@pytest.mark.slow
def test_corrected_projections_arbitrary_stl_dx_sweep(tmp_path):
    """Reference-breadth check (quick_compare_robin_correction_surface_
    complex.py:335-407): an ARBITRARY body loaded from an STL file, voxel
    pitch sweep — per-direction projected-area sums converge to the
    triangle-exact projections."""
    from adi_thermal_fields_tpu.geometry.stl import load_stl, save_stl_binary

    path = str(tmp_path / "blob_mm.stl")
    cone = _cone_mesh(R=0.02, H=0.05, tilt=0.4)
    save_stl_binary(path, type(cone)(cone.triangles * 1e3))  # mm units
    mesh = load_stl(path, units="auto")                      # -> meters
    n = mesh.face_normals
    A = mesh.face_areas
    exact = {}
    for f, (ax, sg) in {"x-": (0, -1), "x+": (0, 1), "y-": (1, -1),
                        "y+": (1, 1), "z-": (2, -1), "z+": (2, 1)}.items():
        exact[f] = float(np.sum(np.maximum(sg * n[:, ax], 0.0) * A))
    errs = []
    for dx in (2e-3, 1e-3, 0.5e-3):
        mask, origin = voxelize_solid(mesh, dx)
        proj = voxel_projected_areas(mesh, mask, origin, dx)
        errs.append(max(abs(proj[f].sum() - exact[f]) / max(exact[f], 1e-12)
                        for f in exact))
    assert errs[-1] < 0.03, errs
    assert errs[2] <= errs[0] + 0.005, errs
