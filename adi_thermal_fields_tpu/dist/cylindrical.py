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
    on_tpu = jax.default_backend() == "tpu"

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    if on_tpu and grid.nphi > 1:
        # TPU: the f32 FFT is inaccurate AND slow (NOTES.md); run the cyclic
        # Pallas kernel per shard with phi local.
        from jax import shard_map

        from ..solvers.pallas_sweeps import fused_cyclic_phi
        from ..solvers.spectral import phi_eigenvalue_factors

        def _local_phi(X, fac):
            return fused_cyclic_phi(X, fac)

        phi_sm = shard_map(_local_phi, mesh=mesh,
                           in_specs=(P(None, None, (a, b)),
                                     P(None, (a, b))),
                           out_specs=P(None, None, (a, b)), check_vma=False)

        def phi_stage(X, dt):
            fac_r = mat.alpha * dt * phi_eigenvalue_factors(grid, dtype=X.dtype)
            fac = jnp.broadcast_to(fac_r[:, None], (grid.nr, grid.nz))
            return phi_sm(constrain(X, P(None, None, (a, b))),
                          constrain(fac, P(None, (a, b))))
    else:
        def phi_stage(X, dt):
            return phi_solve_spectral(constrain(X, P(None, None, (a, b))),
                                      grid, mat, 1.0, dt)

    @jax.jit
    def step(T, dt):
        # r-sweep: r local, batch (phi, z) sharded
        X = _r_sweep(constrain(T, P(None, a, b)), grid, mat, dt,
                     robin_outer, robin_inner)
        # phi solve: phi local, z sharded over the full mesh
        X = phi_stage(X, dt)
        # z-sweep: z local, phi sharded over the full mesh
        X = _z_sweep(constrain(X, P(None, (a, b), None)), grid, mat, dt, zbc)
        return constrain(X, P(None, a, b))

    return step
