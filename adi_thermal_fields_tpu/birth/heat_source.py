"""Moving volumetric heat sources for welding/WAAM torches.

The reference injects heat exclusively by element birth at the deposit
temperature (single_track_on_plate.py:166) and ships an unused surface
impulse primitive (adi3d_numba_coeff.py:304-320).  Production WAAM thermal
models usually also need a distributed torch model; this module provides the
standard ones as pure jittable field generators compatible with the
``source=`` argument of both ADI steps [W/m^3]:

* Gaussian ellipsoid source;
* Goldak double-ellipsoid (the de-facto standard arc-weld model):
  front/rear semi-axes ``a_f``/``a_r`` along travel, width ``b``, depth
  ``c``, power fractions ``f_f + f_r = 2``.

Center positions are traced values, so a moving torch never recompiles.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import CartesianGrid

__all__ = ["GoldakSource", "gaussian_ellipsoid_source", "goldak_source"]

_SQRT3 = float(np.sqrt(3.0))
_NORM = 6.0 * _SQRT3 / (np.pi * np.sqrt(np.pi))


def _cell_centers(grid: CartesianGrid, dtype):
    xs = (jnp.arange(grid.nx, dtype=dtype) + 0.5) * grid.dx
    ys = (jnp.arange(grid.ny, dtype=dtype) + 0.5) * grid.dy
    zs = (jnp.arange(grid.nz, dtype=dtype) + 0.5) * grid.dz
    return xs, ys, zs


def gaussian_ellipsoid_source(grid: CartesianGrid, power: float, center,
                              radii, dtype=jnp.float32) -> jax.Array:
    """Normalized 3-D Gaussian of total power P [W] with 1/e semi-axes
    ``radii = (rx, ry, rz)`` centered at ``center`` (traced)."""
    rx, ry, rz = radii
    xs, ys, zs = _cell_centers(grid, dtype)
    cx, cy, cz = center
    gx = jnp.exp(-((xs - cx) / rx) ** 2)[:, None, None]
    gy = jnp.exp(-((ys - cy) / ry) ** 2)[None, :, None]
    gz = jnp.exp(-((zs - cz) / rz) ** 2)[None, None, :]
    norm = power / (np.pi ** 1.5 * rx * ry * rz)
    return (norm * gx * gy * gz).astype(dtype)


@dataclasses.dataclass(frozen=True)
class GoldakSource:
    """Goldak double-ellipsoid parameters (SI units)."""

    power: float            # absorbed power eta*V*I [W]
    a_f: float              # front semi-axis along travel [m]
    a_r: float              # rear semi-axis along travel [m]
    b: float                # half-width [m]
    c: float                # depth [m]
    travel_axis: int = 1    # torch travel direction (0=x, 1=y)

    @property
    def f_f(self) -> float:
        """Front power fraction (standard continuity choice)."""
        return 2.0 * self.a_f / (self.a_f + self.a_r)

    @property
    def f_r(self) -> float:
        return 2.0 * self.a_r / (self.a_f + self.a_r)


def goldak_source(grid: CartesianGrid, g: GoldakSource, center,
                  dtype=jnp.float32) -> jax.Array:
    """Goldak double-ellipsoid volumetric source field [W/m^3].

    ``q(x) = f * 6*sqrt(3)*P / (a b c pi^1.5) * exp(-3 xi^2/a^2 - 3 eta^2/b^2
    - 3 zeta^2/c^2)`` with the front (a_f, f_f) ellipsoid ahead of the torch
    along the travel axis and the rear one behind; integrates to P.
    """
    xs, ys, zs = _cell_centers(grid, dtype)
    cx, cy, cz = center
    X = xs[:, None, None] - cx
    Y = ys[None, :, None] - cy
    Z = zs[None, None, :] - cz
    along = X if g.travel_axis == 0 else Y
    across = Y if g.travel_axis == 0 else X

    common = jnp.exp(-3.0 * (across / g.b) ** 2 - 3.0 * (Z / g.c) ** 2)
    q_f = (g.f_f / g.a_f) * jnp.exp(-3.0 * (along / g.a_f) ** 2)
    q_r = (g.f_r / g.a_r) * jnp.exp(-3.0 * (along / g.a_r) ** 2)
    q = jnp.where(along >= 0.0, q_f, q_r)
    amp = _NORM * g.power / (g.b * g.c)
    return (amp * q * common).astype(dtype)
