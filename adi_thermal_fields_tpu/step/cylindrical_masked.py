"""Mask-aware cylindrical ADI step with Robin at material/void interfaces.

The reference has no mask-aware cylindrical solver: its ``adi_step_masked``
(quick_spiral_deposition_gif_v5.py:31-70) clamps void cells to ambient and
runs the unmasked core, so every material/void interface cools with an
effective film coefficient k/dx (thousands of W/m^2/K) instead of the
physical convective h — inconsistent with its own analytic spiral oracle,
which applies Robin h at the growth front (spiral_analytic_solution.py:193-204).

This module is the physically consistent masked solver, built the same way as
the Cartesian core (adi3d_numba_coeff.py:57-118 semantics): couplings are
severed across active/void boundaries and every *exposed face* of an active
cell — interior interface or domain end alike — contributes a Robin sink
``theta*dt*alpha*(h/k)*(A_face/V_cell)`` to the diagonal (and ``*T_inf`` to
the RHS).  In the cylindrical metric the face/volume ratios are

    r-faces:   A/V = r_{i+-1/2} / (r_i dr)
    phi-faces: A/V = 1 / (r_i dphi)
    z-faces:   A/V = 1 / dz

which makes the domain-boundary rows *identical* to the unmasked core's
ghost-cell elimination (adi3d_cyl_phi_v3.py:189-202, :276-294) — interface
and boundary Robin unify into one formulation.

Backward-Euler chaining r -> phi -> z, matching the unmasked BE step.  The
phi sweep solves mask-broken *cyclic* tridiagonal systems (Sherman–Morrison;
the FFT path requires circulant operators and only applies to the unmasked
core).  Void rows are identity rows pinned to the void ambient.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import CylindricalGrid
from ..core.material import Material
from ..solvers.thomas import cyclic_thomas, thomas
from .cylindrical import RobinBC, ZFaceBC

__all__ = ["MaskedRobinPlan", "build_masked_robin_plan",
           "masked_robin_solve", "adi_step_masked_robin"]


class MaskedRobinPlan(NamedTuple):
    """Per-sweep inputs of the masked-Robin step, precomputed from the
    activation mask (rebuild on birth events only).  Each sweep tuple is
    ``(cup_lo, cup_hi, geo_lo, geo_hi, sink, sink_rhs)`` — bool coupling
    masks (void/pin folded in), BROADCAST geometry factors (columns/scalars,
    not materialized fields: storing folded f32 coupling fields measured
    slower than recomputing from 1-byte masks — NOTES.md), and the Robin
    sink fields, all per unit ``fac = dt*alpha``."""

    active: jax.Array
    pin: jax.Array
    pin_val: jax.Array
    ambient: jax.Array
    r: tuple
    phi: tuple | None
    z: tuple
    # compressed per-sweep inputs in the SOLVE (axis-first) layout for the
    # fused masked kernels: (code int8, sink, geo...) per axis; None entries
    # fall back to the field-coefficient path
    compressed: tuple | None = None


def _shift(m: jax.Array, axis: int, direction: int, fill=False) -> jax.Array:
    pad = [(0, 0)] * m.ndim
    sl = [slice(None)] * m.ndim
    if direction == +1:
        pad[axis] = (0, 1)
        sl[axis] = slice(1, None)
    else:
        pad[axis] = (1, 0)
        sl[axis] = slice(0, -1)
    return jnp.pad(m, pad, constant_values=fill)[tuple(sl)]


def adi_step_masked_robin(T: jax.Array, grid: CylindricalGrid, mat: Material, *,
                          dt, active: jax.Array,
                          robin_outer: RobinBC, zbc: ZFaceBC,
                          robin_inner: RobinBC | None = None,
                          h_void: float = 0.0, T_inf_void: float = 20.0,
                          h_front: float | None = None,
                          source: jax.Array | None = None,
                          constrain=None,
                          implementation: str = "auto",
                          pad_to_tile: bool = False) -> jax.Array:
    """One BE step of the masked cylindrical problem.

    Parameters
    ----------
    active : (nr, nphi, nz) bool — solid material mask (element birth state).
    robin_outer / robin_inner : Robin data for the *domain* radial faces
        (outer always; inner only on annular grids — a full disk's axis is a
        zero-flux face by metric, r_{-1/2} = 0).
    zbc : domain z-end BCs; kinds "neumann0" | "dirichlet" | "robin".
    h_void, T_inf_void : Robin data applied on interior material/void
        interface faces (all directions).
    h_front : optional override for z+ interface faces (the growth front);
        defaults to ``h_void``.  Lets the front match an end-face film
        coefficient distinct from lateral interfaces.
    constrain : optional ``(x, stage) -> x`` hook called on each sweep's RHS
        with stage in {"r", "phi", "z"} — the multi-chip layer
        (dist/cylindrical.py) passes sharding constraints here so every
        sweep's solve axis stays chip-local.
    implementation : "pallas" (fused field-coefficient kernels,
        solvers/pallas_fields.py), "xla" (scan solvers), or "auto"
        (pallas on a single TPU; xla elsewhere and under ``constrain``).
    pad_to_tile : pad nr/nz to tile-friendly dims with void cells
        (bitwise-inert; see step/cylindrical.padded_cyl_shape).  Padded in,
        padded out is the zero-copy steady state.
    """
    crop = None
    if pad_to_tile:
        from .cylindrical import pad_cyl_domain, padded_cyl_shape

        if tuple(T.shape) != padded_cyl_shape(T.shape):
            crop = T.shape
            T = pad_cyl_domain(T)
            active = pad_cyl_domain(active, False)
            if source is not None:
                source = pad_cyl_domain(source)
    plan = build_masked_robin_plan(grid, mat, active, robin_outer=robin_outer,
                                   zbc=zbc, robin_inner=robin_inner,
                                   h_void=h_void, T_inf_void=T_inf_void,
                                   h_front=h_front, dtype=T.dtype)
    out = masked_robin_solve(T, plan, grid, mat, dt=dt, source=source,
                             constrain=constrain,
                             implementation=implementation)
    return out if crop is None else out[:crop[0], :, :crop[2]]


def build_masked_robin_plan(grid: CylindricalGrid, mat: Material,
                            active: jax.Array, *, robin_outer: RobinBC,
                            zbc: ZFaceBC, robin_inner: RobinBC | None = None,
                            h_void: float = 0.0, T_inf_void: float = 20.0,
                            h_front: float | None = None,
                            dtype=None) -> MaskedRobinPlan:
    """Precompute the per-sweep coefficient fields (jitted; depends only on
    the activation mask — rebuild on birth events, not per sub-step)."""
    dtype = dtype or jnp.result_type(float)
    active = active.astype(bool)
    # the mask may arrive PADDED to tile-friendly dims (pad_to_tile): padded
    # cells are void, so every sink/coupling below is zero there and the
    # solver's void-identity rows make the padding bitwise-inert.  Only nphi
    # must stay exact (it is the periodic line length).
    nr, nphi, nz = active.shape
    if nphi != grid.nphi:
        raise ValueError(f"active nphi {nphi} != grid nphi {grid.nphi} "
                         "(phi cannot be padded — periodic line)")
    dr, dz, dphi = grid.dr, grid.dz, grid.dphi
    if h_front is None:
        h_front = h_void

    r = np.maximum(np.asarray(grid.r, np.float64), 1e-15)
    r_imh = np.maximum(np.asarray(grid.r_imh, np.float64), 0.0)
    r_iph = np.asarray(grid.r_iph, np.float64)
    if nr > grid.nr:   # padded radii: any positive geometry (cells are void)
        r, r_imh, r_iph = (np.pad(v, (0, nr - grid.nr), mode="edge")
                           for v in (r, r_imh, r_iph))
    inv_k = 1.0 / mat.k

    # Coupling presence per face (both cells active; domain edges absent).
    def coupled(axis, direction):
        return active & _shift(active, axis, direction)

    # Exposed faces: active cell whose neighbor across the face is void or
    # the domain edge.
    def exposed(axis, direction):
        return active & ~_shift(active, axis, direction)

    # ---- per-face Robin sink fields: (h/k) * (A_face / V_cell) ------------
    col = lambda v: jnp.asarray(v, dtype)[:, None, None]

    g_r_minus = col(r_imh / (r * dr))           # A/V for r- faces
    g_r_plus = col(r_iph / (r * dr))            # A/V for r+ faces
    g_phi = col(1.0 / (r * dphi))               # A/V for phi faces
    g_z = 1.0 / dz                              # A/V for z faces

    h_in = robin_inner.h if (grid.is_annular and robin_inner is not None) else 0.0
    t_in = robin_inner.T_inf if robin_inner is not None else T_inf_void
    h_out, t_out = robin_outer.h, robin_outer.T_inf

    idx_r0 = jnp.arange(nr)[:, None, None]
    is_r_first = idx_r0 == 0
    is_r_last = idx_r0 == grid.nr - 1      # PHYSICAL domain faces, not pad
    idx_z = jnp.arange(nz)[None, None, :]
    is_z_first = idx_z == 0
    is_z_last = idx_z == grid.nz - 1

    def hT(face_exposed, geom, is_domain_slab, h_domain, t_domain, h_ifc, t_ifc):
        """(sink, sink*T_inf) fields for one face direction: Robin sink
        ``(h/k) * A_face/V_cell`` on exposed faces, choosing domain vs
        interface Robin data per cell."""
        h = jnp.where(is_domain_slab, h_domain, h_ifc)
        t_ = jnp.where(is_domain_slab, t_domain, t_ifc)
        s = jnp.where(face_exposed, h * inv_k * geom, 0.0).astype(dtype)
        return s, (s * t_).astype(dtype)

    # z-end BC data: robin -> (h, T_inf); neumann0 -> h=0; dirichlet handled
    # below by pinning rows.
    hz_bot = zbc.h_bot if zbc.kind_bot == "robin" else 0.0
    tz_bot = zbc.T_inf_bot
    hz_top = zbc.h_top if zbc.kind_top == "robin" else 0.0
    tz_top = zbc.T_inf_top

    sink_rm, rhs_rm = hT(exposed(0, -1), g_r_minus, is_r_first, h_in, t_in,
                         h_void, T_inf_void)
    sink_rp, rhs_rp = hT(exposed(0, +1), g_r_plus, is_r_last, h_out, t_out,
                         h_void, T_inf_void)
    # phi faces are PERIODIC: exposure wraps around, no domain edge
    exp_pm = active & ~jnp.roll(active, +1, 1)
    exp_pp = active & ~jnp.roll(active, -1, 1)
    s1, r1 = hT(exp_pm, g_phi, False, 0.0, 0.0, h_void, T_inf_void)
    s2, r2 = hT(exp_pp, g_phi, False, 0.0, 0.0, h_void, T_inf_void)
    sink_pm, rhs_pm = s1 + s2, r1 + r2
    sink_zm, rhs_zm = hT(exposed(2, -1), g_z, is_z_first, hz_bot, tz_bot,
                         h_void, T_inf_void)
    sink_zp, rhs_zp = hT(exposed(2, +1), g_z, is_z_last, hz_top, tz_top,
                         h_front, T_inf_void)

    # Dirichlet z-end rows: active cells in the end slab pinned to the value.
    pin = jnp.zeros(active.shape, bool)
    pin_val = jnp.zeros(active.shape, dtype)
    if zbc.kind_bot == "dirichlet":
        pb = active & is_z_first
        pin = pin | pb
        pin_val = jnp.where(pb, zbc.T_bot, pin_val)
    if zbc.kind_top == "dirichlet":
        pt = active & is_z_last
        pin = pin | pt
        pin_val = jnp.where(pt, zbc.T_top, pin_val)

    live = active & ~pin   # rows with couplings/sinks

    def pack(cup_lo, cup_hi, geom_lo, geom_hi, sink, sink_rhs):
        """Fold void/pin into the bool coupling masks and sink fields; keep
        the geometry as broadcasts (cheap to re-expand per step)."""
        return (cup_lo & live, cup_hi & live,
                jnp.asarray(geom_lo, dtype), jnp.asarray(geom_hi, dtype),
                jnp.where(live, sink, 0.0), jnp.where(live, sink_rhs, 0.0))

    geo_r_lo = col(r_imh / (r * dr * dr))
    geo_r_hi = col(r_iph / (r * dr * dr))
    r_sw = pack(coupled(0, -1), coupled(0, +1), geo_r_lo, geo_r_hi,
                sink_rm + sink_rp, rhs_rm + rhs_rp)

    phi_sw = None
    if nphi > 1:
        geo_phi = col(1.0 / (r * r * dphi * dphi))
        if not grid.is_annular:
            # axis-row regularity on full disks (adi3d_cyl_phi_v3.py:314-317)
            geo_phi = geo_phi.at[0].set(0.0)
        phi_sw = pack(jnp.roll(active, 1, 1) & active,
                      jnp.roll(active, -1, 1) & active, geo_phi, geo_phi,
                      sink_pm, rhs_pm)

    geo_z = jnp.full((), 1.0 / (dz * dz), dtype)
    z_sw = pack(coupled(2, -1), coupled(2, +1), geo_z, geo_z,
                sink_zm + sink_zp, rhs_zm + rhs_zp)

    def code_of(sw, axis, natural=False):
        """int8 sweep code: bits 1/2 = couplings (void/pin severed), bit 4 =
        pinned row, bit 8 = active — bits 4/8 drive the kernels' IN-KERNEL
        prefold (d = pin ? srhs : active ? rhs + fac*srhs : ambient), which
        replaced the separate XLA d-materialization pass (~14 B/cell/sweep,
        VERDICT r2 #2)."""
        cup_lo, cup_hi = sw[0], sw[1]
        code = (cup_lo.astype(jnp.int8) | cup_hi.astype(jnp.int8) * np.int8(2)
                | pin.astype(jnp.int8) * np.int8(4)
                | active.astype(jnp.int8) * np.int8(8))
        return code if natural else jnp.moveaxis(code, axis, 0)

    def sink_of(sw, axis, natural=False):
        return sw[4] if natural else jnp.moveaxis(sw[4], axis, 0)

    def srhs_of(sw, axis, natural=False):
        # sink*T_inf on live rows; the PIN VALUE on pinned rows (the kernel
        # streams one field for both)
        v = jnp.where(pin, pin_val, sw[5])
        return v if natural else jnp.moveaxis(v, axis, 0)

    # compressed kernel inputs (13 B/cell solve + 4 B srhs, prefold fused;
    # the phi entry stays in the NATURAL layout for the axis-1 cyclic
    # kernel — no per-step transpose pair)
    geo_r_lo_v = jnp.asarray(r_imh / (r * dr * dr), dtype)
    geo_r_hi_v = jnp.asarray(r_iph / (r * dr * dr), dtype)
    comp_r = (code_of(r_sw, 0), sink_of(r_sw, 0), srhs_of(r_sw, 0),
              geo_r_lo_v, geo_r_hi_v)
    comp_phi = None
    if phi_sw is not None:
        # phi geometry varies over the (r, z) batch, constant along the line;
        # arrays stay in the NATURAL (r, phi, z) layout (axis-1 kernel)
        geo_phi_b = jnp.broadcast_to(phi_sw[2][:, 0, :], (nr, nz))
        comp_phi = (code_of(phi_sw, 1, natural=True),
                    sink_of(phi_sw, 1, natural=True),
                    srhs_of(phi_sw, 1, natural=True), geo_phi_b)
    geo_z_v = jnp.full((nz,), 1.0 / (dz * dz), dtype)
    comp_z = (code_of(z_sw, 2), sink_of(z_sw, 2), srhs_of(z_sw, 2),
              geo_z_v, geo_z_v)

    return MaskedRobinPlan(active, pin, pin_val,
                           jnp.asarray(T_inf_void, dtype), r_sw, phi_sw, z_sw,
                           (comp_r, comp_phi, comp_z))


def masked_robin_solve(T: jax.Array, plan: MaskedRobinPlan,
                       grid: CylindricalGrid, mat: Material, *, dt,
                       source: jax.Array | None = None, constrain=None,
                       implementation: str = "auto") -> jax.Array:
    """One BE step from a prebuilt plan (per-step work: scale the plan's
    per-unit-fac fields by ``fac = dt*alpha`` and solve the three sweeps)."""
    if implementation == "auto":
        implementation = ("pallas" if (jax.default_backend() == "tpu"
                                       and constrain is None) else "xla")
    use_pallas = implementation == "pallas"
    interp = jax.default_backend() != "tpu"
    if constrain is None:
        constrain = lambda x, stage: x
    dtype = T.dtype
    active = plan.active
    pin = plan.pin
    ambient = plan.ambient
    fac = jnp.asarray(dt * mat.alpha, dtype)  # BE: theta = 1

    if use_pallas and plan.compressed is not None:
        # compressed kernels with the IN-KERNEL prefold: the raw field
        # streams straight into each sweep (code bits 4/8 select
        # pin-value / live / ambient rows), the phi solve runs as an
        # AXIS-1 cyclic kernel in the natural layout, and only the z sweep
        # pays a transpose pair.  Traffic model ~17 B/cell/sweep + 8 B for
        # the z layout pair vs the old ~40 (see bench.py --case masked).
        from ..solvers.pallas_fields import (fused_masked_cyclic_axis1,
                                             fused_masked_sweep)

        comp_r, comp_phi, comp_z = plan.compressed
        R0 = T if source is None else T + dt * source / (mat.rho * mat.cp)
        code, sink0, srhs, glo, ghi = comp_r
        X = fused_masked_sweep(R0, code, sink0, glo, ghi, fac, srhs,
                               ambient, interpret=interp)
        if comp_phi is not None:
            code, sink0, srhs, geo = comp_phi
            X = fused_masked_cyclic_axis1(X, code, sink0, srhs, geo, fac,
                                          ambient, interpret=interp)
        code, sink0, srhs, glo, ghi = comp_z
        if jnp.promote_types(dtype, jnp.float32) == dtype:
            # NATURAL rhs/out z sweep: in-kernel chunk relayout replaces
            # the step-level transpose pair (chip-gated 1.81x pattern,
            # scripts/znat_chip.py) — the last layout traffic in the
            # masked step is gone (~51 B/cell model, was 59)
            return fused_masked_sweep(X, code, sink0, glo, ghi, fac, srhs,
                                      ambient, interpret=interp,
                                      nat_rhs_out=True)
        Xz = fused_masked_sweep(jnp.transpose(X, (2, 0, 1)), code, sink0,
                                glo, ghi, fac, srhs, ambient,
                                interpret=interp)
        return jnp.transpose(Xz, (1, 2, 0))

    def sweep(rhs, axis, sw, periodic=False):
        cup_lo, cup_hi, geo_lo, geo_hi, sink, sink_rhs = sw
        mv = lambda t: jnp.moveaxis(t, axis, 0)
        d = rhs + fac * sink_rhs
        d = jnp.where(active, d, ambient)
        d = jnp.where(pin, plan.pin_val, d)

        a = jnp.where(cup_lo, -fac * geo_lo, 0.0).astype(dtype)
        c = jnp.where(cup_hi, -fac * geo_hi, 0.0).astype(dtype)
        b = 1.0 - (a + c) + fac * sink     # void/pinned rows: exactly 1
        if use_pallas:
            from ..solvers.pallas_fields import (fused_cyclic_fields,
                                                 fused_tridiag_fields)

            solve = fused_cyclic_fields if periodic else fused_tridiag_fields
            x = solve(mv(a), mv(b), mv(c), mv(d), interpret=interp)
        elif periodic:
            x = cyclic_thomas(mv(a), mv(b), mv(c), mv(d))
        else:
            x = thomas(mv(a), mv(b), mv(c), mv(d))
        return jnp.moveaxis(x, 0, axis)

    R0 = T if source is None else T + dt * source / (mat.rho * mat.cp)
    R0 = jnp.where(active, R0, ambient)

    X = sweep(constrain(R0, "r"), 0, plan.r)
    if plan.phi is not None:
        X = sweep(constrain(X, "phi"), 1, plan.phi, periodic=True)
    X = sweep(constrain(X, "z"), 2, plan.z)
    return jnp.where(active, X, ambient)
