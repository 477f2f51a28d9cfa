"""Exposed-face detection on a boolean solid mask.

A cell is "exposed" on face f (one of x-/x+/y-/y+/z-/z+) when it is inside the
solid mask and its neighbor across that face is void or outside the domain.
Semantics match the reference ``exposed_mask`` (adi3d_numba_coeff.py:38-55),
vectorized with jnp shifts so it is jittable and re-runs cheaply on every
element-birth event.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["FACES", "exposed_face", "exposed_faces", "shift_in"]

FACES = ("x-", "x+", "y-", "y+", "z-", "z+")

_AXIS = {"x": 0, "y": 1, "z": 2}


def shift_in(arr: jax.Array, axis: int, direction: int, fill) -> jax.Array:
    """Return ``arr`` shifted by one cell so that element i holds the neighbor
    value at ``i + direction`` along ``axis``; out-of-domain slots get ``fill``.

    Implemented as roll + edge-row set (NOT pad + slice): under the SPMD
    partitioner a pad(constant)+slice along a *sharded* axis was observed to
    MISCOMPILE (jax 0.9 CPU mesh: the shifted mask came back wrong deep in a
    larger program, injecting phantom material/void interface sinks — caught
    by test_sharded_cyl_varprop_matches_single_device at 0.4 K).  roll
    lowers to a collective-permute, which partitions correctly, and the
    single written edge row is sliced on an unsharded index."""
    if direction == +1:
        out = jnp.roll(arr, -1, axis=axis)
        idx = [slice(None)] * arr.ndim
        idx[axis] = -1
    elif direction == -1:
        out = jnp.roll(arr, 1, axis=axis)
        idx = [slice(None)] * arr.ndim
        idx[axis] = 0
    else:
        raise ValueError("direction must be +1 or -1")
    return out.at[tuple(idx)].set(fill)


def exposed_face(mask: jax.Array, face: str) -> jax.Array:
    """Boolean field: in-mask cells whose neighbor across ``face`` is void or
    the domain edge (reference adi3d_numba_coeff.py:38-55)."""
    axis = _AXIS[face[0]]
    direction = -1 if face[1] == "-" else +1
    nbr = shift_in(mask, axis, direction, fill=False)
    return mask & ~nbr


def exposed_faces(mask: jax.Array) -> dict[str, jax.Array]:
    """All six exposed-face fields keyed by face name."""
    return {f: exposed_face(mask, f) for f in FACES}
