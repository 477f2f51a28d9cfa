"""Unified boundary-condition coefficient assembly for the Cartesian ADI core.

Reproduces the semantics of the reference's
``precompute_coeff_packs_unified`` (adi3d_numba_coeff.py:57-118):

* **Robin** (convective) faces become a volumetric sink coefficient
  ``h * A / (rho cp V)`` [1/s] accumulated onto the exposed cells of each
  face, summed *per axis* (x-/x+ into the x pack, etc.).  ``h`` may be a
  scalar, a full 3-D field, or a per-face dict of either.
* **Neumann** flux ``q'' [W/m^2]`` (positive = heat INTO the solid) becomes an
  explicit source ``q'' * A / (rho cp V)`` [K/s] on exposed cells, per axis.
* **Dirichlet** cells are flagged by a boolean mask + value field; the sweeps
  turn those rows into identity rows pinned at the value.

TPU-first departure from the reference: the builder is a pure jittable
function of the mask and BC fields, because element birth rebuilds packs on
the hot path (waam_from_stl_v7_mm.py:534 rebuilds after every layer;
single_track_on_plate.py:163 after every track column).  Rebuild is O(N)
elementwise work fully fused by XLA — no recompilation, no host round trip.
"""
from __future__ import annotations

from typing import Any, Mapping, NamedTuple

import jax
import jax.numpy as jnp

from ..core.grid import CartesianGrid
from ..core.material import Material
from .faces import FACES, exposed_face

__all__ = ["CoeffPacks", "build_coeff_packs"]

_AXIS_OF_FACE = {"x-": 0, "x+": 0, "y-": 1, "y+": 1, "z-": 2, "z+": 2}


class CoeffPacks(NamedTuple):
    """Per-axis BC coefficient fields (a pytree; all leaves device arrays).

    coeff : (3, nx, ny, nz) Robin volumetric sink per axis [1/s]
    qflux : (3, nx, ny, nz) Neumann volumetric source per axis [K/s]
    dir_mask : (nx, ny, nz) bool, Dirichlet-pinned cells
    dir_val  : (nx, ny, nz) pinned temperature values
    """

    coeff: jax.Array
    qflux: jax.Array
    dir_mask: jax.Array
    dir_val: jax.Array


def _normalize_per_face(spec: Any, faces=FACES) -> dict[str, Any]:
    """Expand scalar/field/dict specs into a per-face dict (values may be
    scalars or 3-D fields; missing faces map to None)."""
    if spec is None:
        return {f: None for f in faces}
    if isinstance(spec, Mapping):
        return {f: spec.get(f, None) for f in faces}
    return {f: spec for f in faces}


def build_coeff_packs(
    mask: jax.Array,
    grid: CartesianGrid,
    mat: Material,
    *,
    robin_h: Any = None,
    neumann: Mapping[str, Any] | None = None,
    dirichlet_mask: jax.Array | None = None,
    dirichlet_value: Any = None,
    dtype=None,
) -> CoeffPacks:
    """Assemble per-axis coefficient packs from unified BC specs.

    Matches reference adi3d_numba_coeff.py:57-118 exactly: Robin h and
    Neumann q'' act on the exposed cells of their face, scaled by
    ``A/(rho cp V) = 1/(rho cp dx)``.
    """
    if dtype is None:
        dtype = jnp.result_type(float)
    mask = mask.astype(bool)
    shape = mask.shape
    # A_face / (rho cp V) per axis = 1 / (rho cp d_axis); reduces to the
    # reference's single 1/(rho cp dx) for cubic voxels
    inv_ccell = [1.0 / (mat.rho * mat.cp * d) for d in grid.spacing]

    coeff = [jnp.zeros(shape, dtype) for _ in range(3)]
    qflux = [jnp.zeros(shape, dtype) for _ in range(3)]

    h_per_face = _normalize_per_face(robin_h)
    q_per_face = _normalize_per_face(neumann if neumann is not None else None)

    for f in FACES:
        ax = _AXIS_OF_FACE[f]
        hf = h_per_face[f]
        qf = q_per_face[f]
        if hf is None and qf is None:
            continue
        exp = exposed_face(mask, f)
        if hf is not None:
            hfield = jnp.asarray(hf, dtype)
            coeff[ax] = coeff[ax] + jnp.where(exp, hfield * inv_ccell[ax], 0.0)
        if qf is not None:
            qfield = jnp.asarray(qf, dtype)
            qflux[ax] = qflux[ax] + jnp.where(exp, qfield * inv_ccell[ax], 0.0)

    if dirichlet_mask is None:
        dir_mask = jnp.zeros(shape, bool)
    else:
        dir_mask = dirichlet_mask.astype(bool)
    if dirichlet_value is None:
        dir_val = jnp.zeros(shape, dtype)
    else:
        dir_val = jnp.broadcast_to(jnp.asarray(dirichlet_value, dtype), shape)

    return CoeffPacks(
        coeff=jnp.stack(coeff),
        qflux=jnp.stack(qflux),
        dir_mask=dir_mask,
        dir_val=dir_val,
    )
