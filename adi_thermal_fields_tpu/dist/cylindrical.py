"""Multi-chip domain decomposition for the cylindrical BE step.

Sharding strategy per stage (field (nr, nphi, nz); nr is typically small —
a wall a few dozen cells thick — so the radial axis always stays local):

    r-sweep:   shard (phi over 'a', z over 'b'), r local
    phi-FFT:   shard (r?/z): phi must be local -> P(None, None, 'b') over z
               with 'a' folded into z as well when nz >> nr (use P('a'?) no:
               keep it simple: P(None, None, ('a','b')) shards z over the
               whole mesh)
    z-sweep:   shard (phi over ('a','b')), z local

XLA lowers the stage transitions to all-to-alls over ICI, exactly like the
Cartesian layer (dist/cartesian.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.grid import CylindricalGrid
from ..core.material import Material
from ..step.cylindrical import RobinBC, ZFaceBC, _r_sweep, _z_sweep
from ..solvers.spectral import phi_solve_spectral

__all__ = ["sharded_cylindrical_step"]


def sharded_cylindrical_step(grid: CylindricalGrid, mat: Material, mesh: Mesh,
                             *, robin_outer: RobinBC, zbc: ZFaceBC,
                             robin_inner: RobinBC | None = None):
    """Jitted multi-chip cylindrical BE step ``step(T, dt)``; semantics of
    step/cylindrical.adi_step(scheme="be")."""
    a, b = mesh.axis_names

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    @jax.jit
    def step(T, dt):
        # r-sweep: r local, batch (phi, z) sharded
        X = _r_sweep(constrain(T, P(None, a, b)), grid, mat, dt,
                     robin_outer, robin_inner)
        # phi spectral: phi local, z sharded over the full mesh
        X = phi_solve_spectral(constrain(X, P(None, None, (a, b))),
                               grid, mat, 1.0, dt)
        # z-sweep: z local, phi sharded over the full mesh
        X = _z_sweep(constrain(X, P(None, (a, b), None)), grid, mat, dt, zbc)
        return constrain(X, P(None, a, b))

    return step
