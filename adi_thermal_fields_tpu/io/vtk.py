"""Legacy ASCII VTK STRUCTURED_POINTS writer.

One writer for the whole framework (the reference ships two divergent copies:
vtk_writer.py:5-31 in SI units and waam_from_stl_v7_mm.py:186-215 in mm).
Fields are written F-order (x fastest), one z-y row per line, matching both
reference writers' layouts.  Units are the caller's; the WAAM app passes mm
to match the reference's output convention.
"""
from __future__ import annotations

import numpy as np

__all__ = ["write_vtk_structured_points"]


def write_vtk_structured_points(path: str, fields: dict[str, np.ndarray], *,
                                spacing: float, origin=(0.0, 0.0, 0.0),
                                comment: str = "adi_thermal_fields_tpu") -> None:
    """Write one or more same-shaped 3-D scalar fields."""
    items = list(fields.items())
    if not items:
        raise ValueError("no fields to write")
    shape = np.asarray(items[0][1]).shape
    nx, ny, nz = shape
    ox, oy, oz = map(float, origin)
    with open(path, "w", encoding="utf-8") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write(comment + "\n")
        f.write("ASCII\n")
        f.write("DATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {nx} {ny} {nz}\n")
        f.write(f"ORIGIN {ox:.9g} {oy:.9g} {oz:.9g}\n")
        f.write(f"SPACING {spacing:.9g} {spacing:.9g} {spacing:.9g}\n")
        f.write(f"POINT_DATA {nx * ny * nz}\n")
        for name, arr in items:
            arr = np.asarray(arr, np.float64)
            if arr.shape != shape:
                raise ValueError(f"field {name!r} shape {arr.shape} != {shape}")
            f.write(f"SCALARS {name} float 1\n")
            f.write("LOOKUP_TABLE default\n")
            # F-order: x fastest, then y, then z
            flat = np.asarray(arr, np.float32).transpose(2, 1, 0)
            for plane in flat:           # z
                for row in plane:        # y
                    f.write(" ".join(f"{v:.6g}" for v in row) + "\n")
