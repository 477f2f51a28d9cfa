"""Native (C++) host geometry kernels vs the numpy reference path."""
import numpy as np
import pytest

from adi_thermal_fields_tpu.geometry.primitives import box_mesh, uv_sphere_mesh
from adi_thermal_fields_tpu.geometry.voxelize import voxelize_solid
from adi_thermal_fields_tpu.native.loader import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("mesh_fn", [
    lambda: box_mesh(size=(0.01, 0.012, 0.008), center=(0.005, 0.006, 0.004)),
    lambda: uv_sphere_mesh(0.008, n_theta=24, n_phi=48),
])
def test_native_voxelizer_matches_numpy(mesh_fn):
    mesh = mesh_fn()
    m_nat, org1 = voxelize_solid(mesh, 1e-3, use_native=True)
    m_py, org2 = voxelize_solid(mesh, 1e-3, use_native=False)
    np.testing.assert_array_equal(m_nat, m_py)
    np.testing.assert_allclose(org1, org2)
    assert m_nat.any()
