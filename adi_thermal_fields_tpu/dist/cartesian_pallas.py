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
from ..solvers.pallas_sweeps import (fused_sweep_axis0_v2,
                                     fused_sweep_axis1_v2)
from ..step.cartesian import masked_laplacian_1d
from ..step.cartesian_pallas import SweepPlan

__all__ = ["sharded_adi_step_pallas", "shard_plan"]


def _stoch_round_bf16(x, seed):
    """Unbiased f32 -> bf16 rounding in plain XLA: add 16 uniform random low
    bits to the f32 bit pattern, truncate.  The sweep kernels stochastically
    round their own stores (pltpu PRNG); this covers the explicit stencil
    pass, which must stay in global XLA for its cross-shard halo exchange.
    Round-to-nearest here would silently drop sub-quantum updates (~8 K at
    1500 C) and freeze slow cooling — see NOTES.md (bf16 production
    hazard)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    r = jax.random.bits(jax.random.key(seed), bits.shape, jnp.uint32)
    bits = bits + (r & jnp.uint32(0xFFFF))
    return jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.bfloat16)


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


def shard_plan(plan: SweepPlan, mesh: Mesh, *, traced: bool = False) -> SweepPlan:
    """Place the plan's per-axis arrays in their sweep's layout sharding.

    ``traced=True`` uses sharding *constraints* instead of device_put so the
    plan rebuild can live inside a jitted program (the mesh-aware engine
    rebuilds the plan functionally on every birth event)."""
    s = _specs(mesh)
    place = (jax.lax.with_sharding_constraint if traced else jax.device_put)

    def put(tup):
        if tup is None:
            return None
        return tuple(place(v, NamedSharding(mesh, s[ax]))
                     for ax, v in enumerate(tup))

    mask = place(plan.mask, NamedSharding(mesh, s[0]))
    mask_i8 = (None if plan.mask_i8 is None
               else place(plan.mask_i8, NamedSharding(mesh, s[0])))
    return SweepPlan(mask, put(plan.codes), put(plan.coeffs),
                     put(plan.qfluxes), put(plan.dir_vals), mask_i8,
                     plan.rob_c)  # (3,) per-axis consts: replicated as-is


def sharded_adi_step_pallas(grid: CartesianGrid, mat: Material, mesh: Mesh, *,
                            theta: float = 0.5, t_inf: float = 20.0,
                            interpret: bool = False):
    """Jitted multi-chip fused-kernel step ``step(T, plan, dt)``."""
    from jax import shard_map

    a, b = mesh.axis_names
    s = _specs(mesh)
    kappa = mat.alpha
    inv_d2 = [1.0 / (d * d) for d in grid.spacing]   # per-axis (anisotropic)

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def local0(rhs, code, coeff, tg, dt):
        return fused_sweep_axis0_v2(rhs, code, coeff, tg, dt, t_inf,
                                    interpret=interpret)

    def local1(rhs, code, coeff, tg, dt):
        return fused_sweep_axis1_v2(rhs, code, coeff, tg, dt, t_inf,
                                    interpret=interpret)

    def local0_lite(rhs, code, tg, dt, rc):
        return fused_sweep_axis0_v2(rhs, code, None, tg, dt, t_inf,
                                    rob_c=rc, interpret=interpret)

    def local1_lite(rhs, code, tg, dt, rc):
        return fused_sweep_axis1_v2(rhs, code, None, tg, dt, t_inf,
                                    rob_c=rc, interpret=interpret)

    # stochastic (bf16) variants: per-shard decorrelated kernel seeds — the
    # kernel itself strides its PRNG by program id, so shards stride by a
    # constant far above any per-shard program count
    nb = mesh.shape[b]

    def _shard_seed(seed):
        idx = jax.lax.axis_index(a) * nb + jax.lax.axis_index(b)
        return (jnp.asarray(seed, jnp.int32)
                + (idx + 1).astype(jnp.int32) * jnp.int32(1_000_003))

    def local0_s(rhs, code, coeff, tg, dt, seed):
        return fused_sweep_axis0_v2(rhs, code, coeff, tg, dt, t_inf,
                                    rng_seed=_shard_seed(seed),
                                    interpret=interpret)

    def local1_s(rhs, code, coeff, tg, dt, seed):
        return fused_sweep_axis1_v2(rhs, code, coeff, tg, dt, t_inf,
                                    rng_seed=_shard_seed(seed),
                                    interpret=interpret)

    def local0_lite_s(rhs, code, tg, dt, rc, seed):
        return fused_sweep_axis0_v2(rhs, code, None, tg, dt, t_inf,
                                    rob_c=rc, rng_seed=_shard_seed(seed),
                                    interpret=interpret)

    def local1_lite_s(rhs, code, tg, dt, rc, seed):
        return fused_sweep_axis1_v2(rhs, code, None, tg, dt, t_inf,
                                    rob_c=rc, rng_seed=_shard_seed(seed),
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
    lspec = (lambda i: (s[i], s[i], P(), P(), P()))
    sweep_x_l = shard_map(local0_lite, mesh=mesh, in_specs=lspec(0),
                          out_specs=s[0], check_vma=False)
    sweep_y_l = shard_map(local1_lite, mesh=mesh, in_specs=lspec(1),
                          out_specs=s[1], check_vma=False)
    sweep_z_l = shard_map(local0_lite, mesh=mesh, in_specs=lspec(2),
                          out_specs=s[2], check_vma=False)
    sspec = (lambda i: (s[i], s[i], s[i], P(), P(), P()))
    sweep_x_s = shard_map(local0_s, mesh=mesh, in_specs=sspec(0),
                          out_specs=s[0], check_vma=False)
    sweep_y_s = shard_map(local1_s, mesh=mesh, in_specs=sspec(1),
                          out_specs=s[1], check_vma=False)
    sweep_z_s = shard_map(local0_s, mesh=mesh, in_specs=sspec(2),
                          out_specs=s[2], check_vma=False)
    lsspec = (lambda i: (s[i], s[i], P(), P(), P(), P()))
    sweep_x_ls = shard_map(local0_lite_s, mesh=mesh, in_specs=lsspec(0),
                           out_specs=s[0], check_vma=False)
    sweep_y_ls = shard_map(local1_lite_s, mesh=mesh, in_specs=lsspec(1),
                           out_specs=s[1], check_vma=False)
    sweep_z_ls = shard_map(local0_lite_s, mesh=mesh, in_specs=lsspec(2),
                           out_specs=s[2], check_vma=False)

    def prefold(rhs, plan, ax, dt):
        """Fold Neumann sources / Dirichlet pins into the sweep RHS in global
        XLA (sharded elementwise), keeping the per-shard kernels 4-input."""
        if plan.qfluxes is not None:
            rhs = rhs + dt * plan.qfluxes[ax]
        if plan.dir_vals is not None:
            pin = (plan.codes[ax] & 4) > 0
            rhs = jnp.where(pin, plan.dir_vals[ax], rhs)
        return rhs

    def coeff_of(plan, ax):
        if plan.dir_vals is None:
            return plan.coeffs[ax]
        return jnp.where((plan.codes[ax] & 4) > 0, 0.0, plan.coeffs[ax])

    @jax.jit
    def step(T, plan: SweepPlan, dt, source=None, rng_seed=None):
        mask = plan.mask
        stoch = rng_seed is not None and T.dtype == jnp.bfloat16
        if stoch:
            # bf16 production mode: all arithmetic in f32, every bf16 store
            # stochastically rounded — the stencil pass via the XLA-side bit
            # trick (it needs global halos), the sweeps via the kernels'
            # pltpu-PRNG stores with per-shard decorrelated seeds
            dtf = jnp.asarray(dt, jnp.float32)
            tgs = [theta * (kappa * dtf * iv) for iv in inv_d2]
            Tf = constrain(T, s[0]).astype(jnp.float32)
            lap = (masked_laplacian_1d(Tf, mask, 0, inv_d2[0])
                   + masked_laplacian_1d(Tf, mask, 1, inv_d2[1])
                   + masked_laplacian_1d(Tf, mask, 2, inv_d2[2]))
            R0f = Tf + dtf * kappa * (1.0 - theta) * lap
            if source is not None:
                R0f = R0f + jnp.where(mask, dtf * source / (mat.rho * mat.cp),
                                      0.0)
            R0 = _stoch_round_bf16(constrain(R0f, s[0]), rng_seed)

            def prefold_s(rhs, ax, seed):
                # sources folded at f32 + one stochastic re-round; Dirichlet
                # pins are exact overwrites (no rounding concern)
                if plan.qfluxes is not None:
                    rhs = _stoch_round_bf16(
                        rhs.astype(jnp.float32) + dtf * plan.qfluxes[ax],
                        seed)
                if plan.dir_vals is not None:
                    pin = (plan.codes[ax] & 4) > 0
                    rhs = jnp.where(pin, plan.dir_vals[ax].astype(rhs.dtype),
                                    rhs)
                return rhs

            sd = jnp.asarray(rng_seed, jnp.int32)
            if plan.coeffs is None:
                rc = jnp.broadcast_to(
                    jnp.asarray(plan.rob_c, jnp.float32), (3,))
                U = sweep_x_ls(constrain(prefold_s(R0, 0, sd + 10), s[0]),
                               plan.codes[0], tgs[0], dtf, rc[0], sd + 1)
                V = sweep_y_ls(constrain(prefold_s(U, 1, sd + 20), s[1]),
                               plan.codes[1], tgs[1], dtf, rc[1], sd + 2)
                Wz = sweep_z_ls(constrain(prefold_s(
                    jnp.transpose(V, (2, 0, 1)), 2, sd + 30), s[2]),
                    plan.codes[2], tgs[2], dtf, rc[2], sd + 3)
                return constrain(jnp.transpose(Wz, (1, 2, 0)), s[0])
            U = sweep_x_s(constrain(prefold_s(R0, 0, sd + 10), s[0]),
                          plan.codes[0], coeff_of(plan, 0), tgs[0], dtf,
                          sd + 1)
            V = sweep_y_s(constrain(prefold_s(U, 1, sd + 20), s[1]),
                          plan.codes[1], coeff_of(plan, 1), tgs[1], dtf,
                          sd + 2)
            Wz = sweep_z_s(constrain(prefold_s(
                jnp.transpose(V, (2, 0, 1)), 2, sd + 30), s[2]),
                plan.codes[2], coeff_of(plan, 2), tgs[2], dtf, sd + 3)
            return constrain(jnp.transpose(Wz, (1, 2, 0)), s[0])

        dt = jnp.asarray(dt, T.dtype)
        tg = [theta * (kappa * dt * iv) for iv in inv_d2]

        T = constrain(T, s[0])
        lap = (masked_laplacian_1d(T, mask, 0, inv_d2[0])
               + masked_laplacian_1d(T, mask, 1, inv_d2[1])
               + masked_laplacian_1d(T, mask, 2, inv_d2[2]))
        R0 = T + dt * kappa * (1.0 - theta) * lap
        if source is not None:
            R0 = R0 + jnp.where(mask, dt * source / (mat.rho * mat.cp), 0.0)

        if plan.coeffs is None:   # plan-lite: coeff derived from code bits
            rc = jnp.asarray(plan.rob_c, T.dtype)
            rc = jnp.broadcast_to(rc, (3,))
            U = sweep_x_l(constrain(prefold(R0, plan, 0, dt), s[0]),
                          plan.codes[0], tg[0], dt, rc[0])
            V = sweep_y_l(constrain(prefold(U, plan, 1, dt), s[1]),
                          plan.codes[1], tg[1], dt, rc[1])
            Wz = sweep_z_l(constrain(prefold(jnp.transpose(V, (2, 0, 1)),
                                             plan, 2, dt), s[2]),
                           plan.codes[2], tg[2], dt, rc[2])
            return constrain(jnp.transpose(Wz, (1, 2, 0)), s[0])
        U = sweep_x(constrain(prefold(R0, plan, 0, dt), s[0]),
                    plan.codes[0], coeff_of(plan, 0), tg[0], dt)
        V = sweep_y(constrain(prefold(U, plan, 1, dt), s[1]),
                    plan.codes[1], coeff_of(plan, 1), tg[1], dt)
        Wz = sweep_z(constrain(prefold(jnp.transpose(V, (2, 0, 1)),
                                       plan, 2, dt), s[2]),
                     plan.codes[2], coeff_of(plan, 2), tg[2], dt)
        return constrain(jnp.transpose(Wz, (1, 2, 0)), s[0])

    return step
