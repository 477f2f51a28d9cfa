"""Performance-path Cartesian ADI step built on the fused Pallas sweeps.

Numerically identical to step/cartesian.adi_step (the lax.scan reference
path) — see tests/test_pallas_sweeps.py — but each implicit sweep is one
fused kernel (solvers/pallas_sweeps.py) and all mask/BC-derived sweep inputs
are prebuilt per axis in that sweep's layout by ``build_sweep_plan`` (they
change only on birth events).  Sweep layouts:

    x: axis-0 kernel on the natural (x, y, z) field — no transpose;
    y: axis-1 kernel on the natural field — no transpose;
    z: axis-0 kernel on the (z, x, y) view — one transpose pair per step
       (fastest of the measured flow variants at 512^3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bc.packs import CoeffPacks
from ..core.grid import CartesianGrid
from ..core.material import Material
from ..solvers.differentiable import sweep_solve, theta_rhs_diff
from ..solvers.pallas_sweeps import _round_up, sweep_code
from .cartesian import masked_laplacian_1d

__all__ = ["SweepPlan", "build_sweep_plan", "adi_step_pallas",
           "padded_shape", "pad_domain"]

# bf16 states through the NATURAL-layout z solve (the kernel widens to f32
# at the in-kernel relayout and narrows on the output restage; round 4A
# measured the bf16 step's transposed-z pair at ~2.4 ms at 512^3).
# Non-stochastic states only.  Chip gate 2026-08-21 04:5x
# (r4_gates.gate_bf16, same-session slope): parity 128^3 BITWISE;
# 512^3 natural-z 9.75 ms vs transposed 10.61 = 1.09x -> ON.
Z_NAT_BF16_DEFAULT = True

# layout of each sweep's arrays (axes of the natural (x,y,z) field):
# x-sweep: natural (axis-0 kernel); y-sweep: natural (axis-1 kernel);
# z-sweep: axis-first (axis-0 kernel on the (z, x, y) view)
_PERM = {0: (0, 1, 2), 1: (0, 1, 2), 2: (2, 0, 1)}


class SweepPlan(NamedTuple):
    """Per-axis sweep inputs in axis-first layouts (rebuilt on birth only)."""

    mask: jax.Array                 # (x, y, z) bool — for the explicit part
    codes: tuple                    # 3 int8 arrays, axis-first
    coeffs: tuple | None            # 3 f32 arrays, axis-first; None = lite
    qfluxes: tuple | None           # 3 arrays or None (no Neumann)
    dir_vals: tuple | None          # 3 arrays or None (no Dirichlet)
    mask_i8: jax.Array | None = None  # int8 mask for the fused stencil pass
    rob_c: jax.Array | None = None  # (3,) per-axis h/(rho cp d_ax) — lite


def padded_shape(shape: tuple) -> tuple:
    """Tile-friendly domain shape for the fused kernels: every sweep then
    sees exact (8, 128) batch tiles and whole 64-row DMA chunks, so no
    kernel wrapper ever pads or slices per call (measured 2x step cost at
    576^3, where each jnp.pad is a full extra HBM pass).  Padding cells are
    void (identity rows / stencil passthrough) — physically inert."""
    nx, ny, nz = shape
    ru = _round_up
    return (ru(nx, 64) if nx >= 64 else ru(nx, 8), ru(ny, 128), ru(nz, 128))


def pad_domain(arr: jax.Array, value=0) -> jax.Array:
    """Pad a (x, y, z) field to ``padded_shape`` with ``value``."""
    ps = padded_shape(arr.shape)
    if tuple(arr.shape) == ps:
        return arr
    return jnp.pad(arr, [(0, p - s) for p, s in zip(ps, arr.shape)],
                   constant_values=value)


def build_sweep_plan(mask: jax.Array, packs: CoeffPacks | None, *,
                     has_neumann: bool | None = None,
                     has_dirichlet: bool | None = None,
                     robin_const: jax.Array | float | None = None,
                     pad_to_tile: bool = False) -> SweepPlan:
    """Precompute per-axis codes and transposed coefficient fields.

    ``has_neumann`` / ``has_dirichlet`` must be python bools when tracing
    (they select the kernel variant); default: derived from the packs when
    called outside jit.

    ``robin_const``: plan-lite mode for the scalar-h all-faces Robin
    configuration (the reference WAAM flagship) — pass ``h/(rho cp dx)``
    [1/s per exposed face] and NO coefficient fields are built or streamed;
    the sweep kernels derive the per-axis Robin sink from the code's
    in-mask bit.  Cuts sweep HBM traffic 13 -> 9 B/cell and the plan's
    device footprint by 12 B/cell.  ``packs`` may be None when no
    Neumann/Dirichlet BCs exist.

    ``pad_to_tile``: pad the domain to ``padded_shape`` (void padding) so
    the fused kernels never pad/slice per call.  ``adi_step_pallas`` then
    accepts T at either the original or the padded shape: padded in,
    padded out (the zero-copy steady state — keep the state padded across
    steps and crop only for I/O with ``T[:nx, :ny, :nz]``); original in,
    original out (one pad + one crop per step).
    """
    mask = mask.astype(bool)
    if pad_to_tile:
        mask = pad_domain(mask, False)
    if has_dirichlet is None:
        has_dirichlet = packs is not None and bool(packs.dir_mask.any())
    if has_neumann is None:
        has_neumann = packs is not None and bool(jnp.any(packs.qflux != 0))

    padf = pad_domain if pad_to_tile else (lambda a: a)
    dirm = padf(packs.dir_mask) if has_dirichlet else None
    tr = lambda arr, ax: jnp.transpose(padf(arr), _PERM[ax])
    # sweep_code returns axis-first; re-lay into each sweep's kernel layout.
    # The axis-0 code carries the full 8-bit stencil neighbor set so the
    # fused theta+x-sweep kernel needs no mask array or halo codes
    # (solvers/pallas_theta_sweep.py); 4-bit consumers ignore the high bits.
    codes = tuple(
        jnp.transpose(jnp.moveaxis(
            sweep_code(mask, dirm, ax, stencil_bits=ax == 0), 0, ax),
            _PERM[ax])
        for ax in range(3))
    if robin_const is not None:
        coeffs = None
        # per-axis h/(rho cp d_axis); a scalar (cubic voxels) broadcasts
        rob_c = jnp.broadcast_to(jnp.asarray(robin_const), (3,))
    else:
        coeffs = tuple(tr(packs.coeff[ax], ax) for ax in range(3))
        rob_c = None
    qfluxes = (tuple(tr(packs.qflux[ax], ax) for ax in range(3))
               if has_neumann else None)
    dir_vals = (tuple(tr(packs.dir_val, ax) for ax in range(3))
                if has_dirichlet else None)
    return SweepPlan(mask, codes, coeffs, qfluxes, dir_vals,
                     mask.astype(jnp.int8), rob_c)


def adi_step_pallas(T: jax.Array, plan: SweepPlan, grid: CartesianGrid,
                    mat: Material, *, dt, theta: float = 0.5, t_inf=0.0,
                    source: jax.Array | None = None,
                    rng_seed=None, interpret: bool = False) -> jax.Array:
    """One theta-scheme ADI step on the fused-kernel path.  ``source``:
    optional volumetric heat rate [W/m^3], as in step/cartesian.adi_step.

    rng_seed: optional int32 (vary it per step!) enabling STOCHASTIC
    rounding of the bf16 stores — unbiased quantization that removes the
    sub-quantum update dropout of round-to-nearest (bf16 state only; this
    path bypasses the custom-VJP wrappers and is not differentiable)."""
    crop = None
    if tuple(T.shape) != tuple(plan.mask.shape):
        # plan built with pad_to_tile: pad T into the plan's tile-friendly
        # shape and crop the result back.  Keeping the state padded across
        # steps (T already at plan shape) skips both copies.
        crop = T.shape
        T = pad_domain(T)
        if tuple(T.shape) != tuple(plan.mask.shape):
            raise ValueError(
                f"T shape {crop} matches neither the plan's domain "
                f"{plan.mask.shape} nor its unpadded original")
    if source is not None and tuple(source.shape) != tuple(plan.mask.shape):
        # the source may be unpadded even when T arrives padded
        source = pad_domain(source)
    fin = (lambda out: out) if crop is None else (
        lambda out: out[:crop[0], :crop[1], :crop[2]])
    mask = plan.mask
    kappa = mat.alpha
    # per-axis 1/d^2 and theta*gam (anisotropic voxels; bitwise-identical
    # to the uniform path for cubic ones — rounding order preserved)
    inv_d2 = [1.0 / (d * d) for d in grid.spacing]
    # scalars at solve precision (f32 when the state is bf16)
    dt = jnp.asarray(dt, jnp.promote_types(T.dtype, jnp.float32))
    tg = [theta * (kappa * dt * iv) for iv in inv_d2]

    stochastic = (rng_seed is not None
                  and T.dtype != jnp.promote_types(T.dtype, jnp.float32))
    lite = plan.coeffs is None
    q = plan.qfluxes or (None, None, None)
    dv = plan.dir_vals or (None, None, None)

    if (lite and source is None and plan.qfluxes is None
            and plan.dir_vals is None and plan.mask_i8 is not None):
        # FUSED theta+x-sweep fast path (the flagship WAAM configuration):
        # the explicit pass is computed in-registers inside the x-sweep
        # kernel — no R0 HBM round trip (8 B/cell) and one launch fewer.
        # Bitwise identical to the unfused chain (tests/test_theta_sweep.py).
        rc = plan.rob_c
        c_exp = dt * kappa * (1.0 - theta)
        if stochastic:
            from ..solvers.pallas_sweeps import (fused_sweep_axis0_v2,
                                                 fused_sweep_axis1_v2)
            from ..solvers.pallas_theta_sweep import fused_theta_sweep_axis0

            U = fused_theta_sweep_axis0(T, plan.codes[0], c_exp,
                                        tuple(inv_d2), tg[0], dt, t_inf,
                                        rc[0], rng_seed=rng_seed + 1,
                                        interpret=interpret)
            V = fused_sweep_axis1_v2(U, plan.codes[1], None, tg[1], dt,
                                     t_inf, rng_seed=rng_seed + 2,
                                     rob_c=rc[1], interpret=interpret)
            W = fused_sweep_axis0_v2(jnp.transpose(V, (2, 0, 1)),
                                     plan.codes[2], None, tg[2], dt, t_inf,
                                     rng_seed=rng_seed + 3, rob_c=rc[2],
                                     interpret=interpret)
            return fin(jnp.transpose(W, (1, 2, 0)))
        from ..solvers.differentiable import (fused_theta_solve_lite,
                                              sweep_solve_lite)

        U = fused_theta_solve_lite(T, plan.codes[0], c_exp, tuple(inv_d2),
                                   rc[0], tg[0], dt, t_inf,
                                   interpret=interpret)
        V = sweep_solve_lite(U, plan.codes[1], rc[1], tg[1], dt, t_inf,
                             axis=1, interpret=interpret)
        if (T.dtype == jnp.promote_types(T.dtype, jnp.float32)
                or Z_NAT_BF16_DEFAULT):
            # NATURAL-layout z solve: the in-kernel chunk relayout replaces
            # the step-level transpose pair — 24% of the 512^3 step was
            # pure layout traffic (chip-gated bitwise + 1.81x vs the
            # t2+axis0+t2 chain, scripts/znat_chip.py); bf16 widens at the
            # relayout (module flag note)
            return fin(sweep_solve_lite(V, plan.codes[2], rc[2], tg[2], dt,
                                        t_inf, axis=2, interpret=interpret))
        W = sweep_solve_lite(jnp.transpose(V, (2, 0, 1)), plan.codes[2],
                             rc[2], tg[2], dt, t_inf, axis=0,
                             interpret=interpret)
        return fin(jnp.transpose(W, (1, 2, 0)))

    if plan.mask_i8 is not None:
        # fused stencil kernel: one HBM pass instead of XLA's ~3
        # (differentiable: L is symmetric, pullback is the stencil itself)
        if stochastic:
            from ..solvers.pallas_stencil import theta_rhs

            R0 = theta_rhs(T, plan.mask_i8, dt * kappa * (1.0 - theta),
                           tuple(inv_d2), rng_seed, interpret=interpret)
        else:
            R0 = theta_rhs_diff(T, plan.mask_i8, dt * kappa * (1.0 - theta),
                                tuple(inv_d2), interpret=interpret)
    else:
        lap = (masked_laplacian_1d(T, mask, 0, inv_d2[0])
               + masked_laplacian_1d(T, mask, 1, inv_d2[1])
               + masked_laplacian_1d(T, mask, 2, inv_d2[2]))
        R0 = T + dt * kappa * (1.0 - theta) * lap
    if source is not None:
        R0 = R0 + jnp.where(mask, dt * source / (mat.rho * mat.cp), 0.0)

    if stochastic:
        from ..solvers.pallas_sweeps import (fused_sweep_axis0_v2,
                                             fused_sweep_axis1_v2)

        cfs = (None, None, None) if lite else plan.coeffs
        rc = plan.rob_c if lite else (None, None, None)
        U = fused_sweep_axis0_v2(R0, plan.codes[0], cfs[0],
                                 tg[0], dt, t_inf, qflux=q[0],
                                 dir_val=dv[0], rng_seed=rng_seed + 1,
                                 rob_c=rc[0], interpret=interpret)
        V = fused_sweep_axis1_v2(U, plan.codes[1], cfs[1],
                                 tg[1], dt, t_inf, qflux=q[1],
                                 dir_val=dv[1], rng_seed=rng_seed + 2,
                                 rob_c=rc[1], interpret=interpret)
        W = fused_sweep_axis0_v2(jnp.transpose(V, (2, 0, 1)), plan.codes[2],
                                 cfs[2], tg[2], dt, t_inf,
                                 qflux=q[2], dir_val=dv[2],
                                 rng_seed=rng_seed + 3, rob_c=rc[2],
                                 interpret=interpret)
        return fin(jnp.transpose(W, (1, 2, 0)))

    if lite:
        from ..solvers.differentiable import sweep_solve_lite

        rc = plan.rob_c
        U = sweep_solve_lite(R0, plan.codes[0], rc[0], tg[0], dt, t_inf,
                             qflux=q[0], dir_val=dv[0], axis=0,
                             interpret=interpret)
        V = sweep_solve_lite(U, plan.codes[1], rc[1], tg[1], dt, t_inf,
                             qflux=q[1], dir_val=dv[1], axis=1,
                             interpret=interpret)
        if (q[2] is None and dv[2] is None
                and (T.dtype == jnp.promote_types(T.dtype, jnp.float32)
                     or Z_NAT_BF16_DEFAULT)):
            # natural-layout z solve (no transpose pair) — see above
            return fin(sweep_solve_lite(V, plan.codes[2], rc[2], tg[2], dt,
                                        t_inf, axis=2, interpret=interpret))
        W = sweep_solve_lite(jnp.transpose(V, (2, 0, 1)), plan.codes[2],
                             rc[2], tg[2], dt, t_inf, qflux=q[2],
                             dir_val=dv[2], axis=0, interpret=interpret)
        return fin(jnp.transpose(W, (1, 2, 0)))

    U = sweep_solve(R0, plan.codes[0], plan.coeffs[0], tg[0], dt,
                    t_inf, qflux=q[0], dir_val=dv[0], axis=0,
                    interpret=interpret)
    V = sweep_solve(U, plan.codes[1], plan.coeffs[1], tg[1],
                    dt, t_inf, qflux=q[1], dir_val=dv[1], axis=1,
                    interpret=interpret)
    W = sweep_solve(jnp.transpose(V, (2, 0, 1)), plan.codes[2],
                    plan.coeffs[2], tg[2], dt, t_inf, qflux=q[2],
                    dir_val=dv[2], axis=0, interpret=interpret)
    return fin(jnp.transpose(W, (1, 2, 0)))
