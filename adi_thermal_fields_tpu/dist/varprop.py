"""Multi-chip variable-property ADI step on the fused varprop kernels.

Same mesh decomposition as dist/cartesian_pallas.py (every sweep's solve
axis chip-local, batch axes sharded over the 2-D mesh, XLA collectives for
the inter-sweep re-lays), applied to the fully-fused varprop formulation
(solvers/pallas_varprop.py): per-shard kernels rebuild the per-cell
tridiagonal coefficients from streamed pre-masked harmonic faces of k(T)
and 1/(rho cp(T)), so the
cross-chip traffic is the state + property fields, never materialized
a/b/c/d.

The explicit theta-pass runs in GLOBAL XLA (the harmonic-face stencil needs
cross-shard halos, which the compiler lowers to collectives); the per-axis
property re-lays ride the same all-to-alls as the RHS.

Previously the engine's mesh+varprop configuration fell back to the
scan/XLA formulation; this is the production path for pods.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.grid import CartesianGrid
from ..core.material import Material

__all__ = ["sharded_adi_step_varprop_fused"]


def _specs(mesh: Mesh):
    a, b = mesh.axis_names
    return {
        0: P(None, a, b),   # natural (x, y, z): x local
        1: P(a, None, b),   # natural-layout axis-1 kernel: y local
        2: P(None, a, b),   # (z, x, y) layout: z local
    }


def sharded_adi_step_varprop_fused(grid: CartesianGrid, mat_ref: Material,
                                   mesh: Mesh, *, k_table=None,
                                   cp_table=None, theta: float = 0.5,
                                   t_inf: float = 20.0,
                                   robin_h: float = 0.0,
                                   interpret: bool = False):
    """Jitted multi-chip fused varprop step
    ``step(T, mask, codes, dt, h_field=None, source=None)``.

    ``codes`` from step/cartesian_varprop.build_varprop_codes (per-axis
    axis-first layouts); ``h_field`` optional per-cell film (radiation) in
    the natural layout.  Robin-only BC set, like adi_step_varprop_fused.
    """
    from jax import shard_map

    from ..solvers.pallas_varprop import (fused_varprop_sweep,
                                          fused_varprop_sweep_axis1)
    from ..step.cartesian import shift_in
    from ..step.cartesian_varprop import build_varprop_fields

    s = _specs(mesh)
    inv_d2 = [1.0 / (d * d) for d in grid.spacing]
    d_ax = grid.spacing
    rob = float(robin_h or 0.0)

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    a_ax, b_ax = mesh.axis_names
    nb = mesh.shape[b_ax]

    def _shard_seed(seed):
        # decorrelate shards; the kernels additionally stride by tile id
        idx = jax.lax.axis_index(a_ax) * nb + jax.lax.axis_index(b_ax)
        return (jnp.asarray(seed, jnp.int32)
                + (idx + 1).astype(jnp.int32) * jnp.int32(1_000_003))

    def mk_sweep(ax, with_h, stoch):
        tg = float(theta) / (d_ax[ax] * d_ax[ax])   # * dt at call time
        sk = 1.0 / d_ax[ax]
        kern = fused_varprop_sweep_axis1 if ax == 1 else fused_varprop_sweep

        if with_h:
            def local(rhs, code, fc, w, h, dt, *seed):
                return kern(rhs, code, fc, w, tg * dt, sk * dt, t_inf, h=h,
                            rng_seed=_shard_seed(seed[0]) if stoch else None,
                            interpret=interpret)
            spec = (s[ax],) * 5 + (P(),) * (2 if stoch else 1)
        else:
            def local(rhs, code, fc, w, dt, *seed):
                return kern(rhs, code, fc, w, tg * dt, sk * dt, t_inf,
                            rob_c=rob,
                            rng_seed=_shard_seed(seed[0]) if stoch else None,
                            interpret=interpret)
            spec = (s[ax],) * 4 + (P(),) * (2 if stoch else 1)
        return shard_map(local, mesh=mesh, in_specs=spec, out_specs=s[ax],
                         check_vma=False)

    sweeps = {(ax, wh, st): mk_sweep(ax, wh, st)
              for ax in range(3) for wh in (False, True)
              for st in (False, True)}

    @jax.jit
    def step(T, mask, codes, dt, h_field=None, source=None, rng_seed=None):
        mask = mask.astype(bool)
        dtype = T.dtype
        cdt = jnp.promote_types(dtype, jnp.float32)
        dtf = jnp.asarray(dt, cdt)
        stoch = rng_seed is not None and dtype != cdt
        T = constrain(T, s[0])

        # pre-masked harmonic faces + 1/(rho cp), in global XLA: the face
        # shifts' cross-shard halos become compiler-lowered collectives
        # under the sharding constraints
        fc, w = build_varprop_fields(T, mask, mat_ref, k_table, cp_table)
        fc = tuple(constrain(f, s[0]) for f in fc)

        # explicit pass in global XLA, reusing the face fields (the hi face
        # of cell i along ax is fc[ax][i+1]).  bf16 stochastic mode rounds
        # the R0 store via the XLA bit trick
        # (dist/cartesian_pallas._stoch_round_bf16 rationale).
        lap = jnp.zeros_like(T, cdt)
        for ax in range(3):
            f_lo = fc[ax].astype(cdt) * inv_d2[ax]
            f_hi = shift_in(fc[ax], ax, +1, fill=0.0).astype(cdt) \
                * inv_d2[ax]
            lap = lap + f_lo * (shift_in(T.astype(cdt), ax, -1, fill=0.0)
                                - T.astype(cdt))
            lap = lap + f_hi * (shift_in(T.astype(cdt), ax, +1, fill=0.0)
                                - T.astype(cdt))
        R0f = T.astype(cdt) + (1.0 - theta) * dtf * w.astype(cdt) \
            * jnp.where(mask, lap, 0.0)
        if source is not None:
            R0f = R0f + jnp.where(mask, dtf * source * w, 0.0)
        if stoch:
            from .cartesian_pallas import _stoch_round_bf16

            R0 = _stoch_round_bf16(constrain(R0f, s[0]), rng_seed)
        else:
            R0 = R0f.astype(dtype)
        R0 = constrain(R0, s[0])

        def run(ax, rhs, fc_t, w_t, h_t):
            key = (ax, h_t is not None, bool(stoch))
            seed = ((jnp.asarray(rng_seed, jnp.int32) + ax + 1,)
                    if stoch else ())
            if h_t is None:
                return sweeps[key](rhs, codes[ax], fc_t, w_t, dtf, *seed)
            return sweeps[key](rhs, codes[ax], fc_t, w_t, h_t, dtf, *seed)

        hf = h_field
        U = run(0, R0, fc[0], w, hf)
        # y: natural-layout axis-1 kernel — only a resharding (y gathers
        # local, x re-shards), no transposes of the property fields
        c1 = lambda x: constrain(x, s[1])
        V = run(1, c1(U), c1(fc[1]), c1(w), None if hf is None else c1(hf))
        t2n = lambda x: constrain(jnp.transpose(x, (2, 0, 1)), s[2])
        W = run(2, t2n(V), t2n(fc[2]), t2n(w),
                None if hf is None else t2n(hf))
        return constrain(jnp.transpose(W, (1, 2, 0)), s[0])

    return step
