"""Multi-chip Cartesian ADI step on the fused Pallas kernels.

Same decomposition as dist/cartesian.py (every sweep's solve axis chip-local;
batch axes sharded over the 2-D mesh; XLA all-to-alls between sweeps), but
each sweep runs the fused Pallas kernel per shard via ``shard_map`` — the
production configuration for v5e pods: fused single-chip kernels + ICI
resharding.  The explicit theta pass and the inter-sweep transposes stay in
global XLA (sharding constraints), so halo exchanges and layout changes are
compiler-lowered collectives.

The sweep plan (step/cartesian_pallas.build_sweep_plan) must be laid out with
the same shardings as the field; `shard_plan` does that.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.grid import CartesianGrid
from ..core.material import Material
from ..solvers.pallas_sweeps import fused_sweep_axis0, fused_sweep_axis1
from ..step.cartesian import masked_laplacian_1d
from ..step.cartesian_pallas import SweepPlan

__all__ = ["sharded_adi_step_pallas", "shard_plan"]


def _specs(mesh: Mesh):
    a, b = mesh.axis_names
    return {
        # natural-layout x-sweep: x local, (y, z) sharded
        0: P(None, a, b),
        # natural-layout y-sweep (axis-1 kernel): y local, (x, z) sharded
        1: P(a, None, b),
        # (z, x, y) layout z-sweep: z local, (x, y) sharded
        2: P(None, a, b),
    }


def shard_plan(plan: SweepPlan, mesh: Mesh) -> SweepPlan:
    """Place the plan's per-axis arrays in their sweep's layout sharding."""
    s = _specs(mesh)

    def put(tup):
        if tup is None:
            return None
        return tuple(jax.device_put(v, NamedSharding(mesh, s[ax]))
                     for ax, v in enumerate(tup))

    mask = jax.device_put(plan.mask, NamedSharding(mesh, s[0]))
    return SweepPlan(mask, put(plan.codes), put(plan.coeffs),
                     put(plan.qfluxes), put(plan.dir_vals))


def sharded_adi_step_pallas(grid: CartesianGrid, mat: Material, mesh: Mesh, *,
                            theta: float = 0.5, t_inf: float = 20.0,
                            interpret: bool = False):
    """Jitted multi-chip fused-kernel step ``step(T, plan, dt)``."""
    from jax import shard_map

    a, b = mesh.axis_names
    s = _specs(mesh)
    kappa = mat.alpha
    inv_dx2 = 1.0 / (grid.dx * grid.dx)

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def local0(rhs, code, coeff, tg, dt):
        return fused_sweep_axis0(rhs, code, coeff, tg, dt, t_inf,
                                 interpret=interpret)

    def local1(rhs, code, coeff, tg, dt):
        return fused_sweep_axis1(rhs, code, coeff, tg, dt, t_inf,
                                 interpret=interpret)

    sweep_x = shard_map(local0, mesh=mesh,
                        in_specs=(s[0], s[0], s[0], P(), P()),
                        out_specs=s[0], check_vma=False)
    sweep_y = shard_map(local1, mesh=mesh,
                        in_specs=(s[1], s[1], s[1], P(), P()),
                        out_specs=s[1], check_vma=False)
    sweep_z = shard_map(local0, mesh=mesh,
                        in_specs=(s[2], s[2], s[2], P(), P()),
                        out_specs=s[2], check_vma=False)

    @jax.jit
    def step(T, plan: SweepPlan, dt):
        mask = plan.mask
        dt = jnp.asarray(dt, T.dtype)
        gam = kappa * dt * inv_dx2
        tg = theta * gam

        T = constrain(T, s[0])
        lap = (masked_laplacian_1d(T, mask, 0, inv_dx2)
               + masked_laplacian_1d(T, mask, 1, inv_dx2)
               + masked_laplacian_1d(T, mask, 2, inv_dx2))
        R0 = T + dt * kappa * (1.0 - theta) * lap

        U = sweep_x(constrain(R0, s[0]), plan.codes[0], plan.coeffs[0], tg, dt)
        V = sweep_y(constrain(U, s[1]), plan.codes[1], plan.coeffs[1], tg, dt)
        Wz = sweep_z(constrain(jnp.transpose(V, (2, 0, 1)), s[2]),
                     plan.codes[2], plan.coeffs[2], tg, dt)
        return constrain(jnp.transpose(Wz, (1, 2, 0)), s[0])

    return step
