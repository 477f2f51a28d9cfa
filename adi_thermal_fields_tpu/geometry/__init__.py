from .bc_correction import corrected_robin_fields, voxel_projected_areas
from .morphology import (closing6, dilate6, erode6, fill_enclosed,
                         flood_fill_outside, solidify_mask)
from .perimeter import digital_perimeter, perimeter_correction_factor
from .primitives import box_mesh, cylinder_mesh, uv_sphere_mesh
from .shapes import cylinder_mask, plate_mask
from .stl import TriMesh, load_stl, save_stl_binary
from .voxelize import (auto_cell_size, grid_from_mesh, subdivided_triangles,
                       voxelize_shell, voxelize_solid)
from .slices import (per_slice_perimeter_scale, section_segments,
                     slice_perimeter_area)
