"""Custom VJPs making the fused Pallas path differentiable.

The scan-based reference path (solvers/thomas.py, step/cartesian.py) is
differentiable out of the box; the fused kernels are not (Pallas kernels
have no automatic transpose).  This module wraps them with hand-derived
VJPs so ``jax.grad`` flows through ``adi_step_pallas``:

  * sweep: ``x = A^{-1} d`` with A the masked tridiagonal operator and
    ``d = pin ? dir_val : rhs + dt*qflux + dt*coeff*T_inf``.  The pullback
    solves the TRANSPOSED system ``A^T y = g`` (sub/super diagonals swapped:
    ``a_t[i] = c[i-1]``, ``c_t[i] = a[i+1]``) and contracts y against the
    parameter Jacobians: for any parameter p,
    ``p_bar = y^T (dd/dp) - y^T (dA/dp) x``.
    The transposed solve runs as the XLA scan Thomas — the backward pass is
    not the production hot path; the primal stays on the fused kernels.
  * theta_rhs stencil: ``R0 = (I + c L) T`` with L the mask-aware Laplacian.
    L is symmetric (couplings exist only between two in-mask cells), so the
    pullback is the stencil itself applied to the cotangent.

Verified against ``jax.grad`` of the scan path in
tests/test_pallas_sweeps.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .thomas import thomas

__all__ = ["sweep_solve", "sweep_solve_lite", "theta_rhs_diff",
           "fused_theta_solve_lite", "vp_sweep_solve", "vp_cyclic_solve",
           "vp2_sweep_solve", "vp2_cyclic_solve"]


def _f0(x):
    """float0 cotangent for integer primal inputs."""
    return np.zeros(x.shape, jax.dtypes.float0)


def _shift_dn(x):
    """x[i-1] with 0 at i=0 (leading axis)."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _shift_up(x):
    """x[i+1] with 0 at i=n-1 (leading axis)."""
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


@functools.cache
def _sweep_solve(axis: int, interpret: bool, has_q: bool, has_d: bool):
    """Differentiable fused sweep for ``axis`` in {0, 1} of the kernel
    layout ((n, B1, B2) or (B1, n, B2)).  Absent qflux/dir_val are passed
    as 0-d dummies so the primal kernel path is byte-identical to the
    non-differentiable call (no folded zero passes)."""
    from .pallas_sweeps import fused_sweep_axis0_v2, fused_sweep_axis1_v2

    kern = fused_sweep_axis0_v2 if axis == 0 else fused_sweep_axis1_v2

    @jax.custom_vjp
    def solve(rhs, code, coeff, tg, dt, t_inf, qflux, dir_val):
        return kern(rhs, code, coeff, tg, dt, t_inf,
                    qflux=qflux if has_q else None,
                    dir_val=dir_val if has_d else None, interpret=interpret)

    def fwd(rhs, code, coeff, tg, dt, t_inf, qflux, dir_val):
        x = solve(rhs, code, coeff, tg, dt, t_inf, qflux, dir_val)
        return x, (x, code, coeff, tg, dt, t_inf, qflux)

    def bwd(res, g):
        x, code, coeff, tg, dt, t_inf, qflux = res
        mv = lambda t: (t if axis == 0 else jnp.moveaxis(t, 1, 0))
        xf, cf, gf = mv(x), mv(coeff), mv(g)
        code_f = mv(code).astype(jnp.int32)
        dtype = x.dtype
        tg = jnp.asarray(tg, dtype)
        dt = jnp.asarray(dt, dtype)
        t_inf = jnp.asarray(t_inf, dtype)
        qf = mv(qflux) if has_q else jnp.zeros_like(xf)

        low = (code_f & 1) > 0
        high = (code_f & 2) > 0
        pin = (code_f & 4) > 0
        coeffp = jnp.where(pin, 0.0, cf).astype(dtype)
        a = jnp.where(low, -tg, 0.0).astype(dtype)   # pin rows have no bits
        c = jnp.where(high, -tg, 0.0).astype(dtype)
        b = jnp.where(pin, 1.0,
                      1.0 + tg * (low.astype(dtype) + high.astype(dtype))
                      + dt * coeffp).astype(dtype)

        # transposed solve: A^T y = g
        y = thomas(_shift_dn(c), b, _shift_up(a), gf)

        unp = ~pin
        rhs_bar = jnp.where(pin, 0.0, y)
        qflux_bar = dt * rhs_bar
        dval_bar = jnp.where(pin, y, 0.0)
        coeff_bar = jnp.where(unp, dt * y * (t_inf - xf), 0.0)

        lowf = low.astype(dtype)
        highf = high.astype(dtype)
        x_lo = _shift_dn(xf)
        x_hi = _shift_up(xf)
        tg_bar = -jnp.sum(jnp.where(
            unp, y * ((lowf + highf) * xf - lowf * x_lo - highf * x_hi), 0.0))
        dt_bar = jnp.sum(jnp.where(unp, y * (qf + coeffp * (t_inf - xf)), 0.0))
        t_inf_bar = jnp.sum(jnp.where(unp, y * dt * coeffp, 0.0))

        mvb = lambda t: (t if axis == 0 else jnp.moveaxis(t, 0, 1))
        q_bar = (mvb(qflux_bar) if has_q
                 else jnp.zeros((), dtype))
        d_bar = (mvb(dval_bar) if has_d
                 else jnp.zeros((), dtype))
        return (mvb(rhs_bar), _f0(code), mvb(coeff_bar),
                tg_bar.astype(dtype), dt_bar.astype(dtype),
                t_inf_bar.astype(dtype), q_bar, d_bar)

    solve.defvjp(fwd, bwd)
    return solve


def sweep_solve(rhs, code, coeff, tg, dt, t_inf, qflux=None, dir_val=None, *,
                axis: int = 0, interpret: bool = False):
    """Differentiable fused masked sweep (axis 0 or 1 of the kernel layout).

    Primal path is identical to fused_sweep_axis{0,1}_v2; the pullback is
    the transposed tridiagonal solve (module docstring)."""
    dtype = rhs.dtype
    has_q, has_d = qflux is not None, dir_val is not None
    zero = jnp.zeros((), dtype)
    return _sweep_solve(axis, interpret, has_q, has_d)(
        rhs, code, coeff, jnp.asarray(tg, dtype), jnp.asarray(dt, dtype),
        jnp.asarray(t_inf, dtype),
        qflux if has_q else zero, dir_val if has_d else zero)


@functools.cache
def _sweep_solve_lite(axis: int, interpret: bool, has_q: bool, has_d: bool):
    """Differentiable plan-lite sweep: the Robin coefficient field is
    derived from the code bits (``cf = rob_c * (2 - low - high) * inmask``,
    see pallas_sweeps.sweep_code) in both the primal kernel and the
    pullback; ``rob_c_bar`` contracts the coefficient cotangent against
    that dependence."""
    from .pallas_sweeps import (fused_sweep_axis0_v2, fused_sweep_axis1_v2,
                                fused_sweep_axis2_v2)

    kern = fused_sweep_axis0_v2 if axis == 0 else fused_sweep_axis1_v2

    @jax.custom_vjp
    def solve(rhs, code, rob_c, tg, dt, t_inf, qflux, dir_val):
        if axis == 2:
            # natural-layout z solve: rhs/x in (x, y, z), code in (z, x, y);
            # the in-kernel chunk relayout replaces the step-level
            # transpose pair (chip-gated bitwise + 1.81x, scripts/znat_chip)
            return fused_sweep_axis2_v2(rhs, code, tg, dt, t_inf, rob_c,
                                        interpret=interpret)
        return kern(rhs, code, None, tg, dt, t_inf,
                    qflux=qflux if has_q else None,
                    dir_val=dir_val if has_d else None, rob_c=rob_c,
                    interpret=interpret)

    def fwd(rhs, code, rob_c, tg, dt, t_inf, qflux, dir_val):
        x = solve(rhs, code, rob_c, tg, dt, t_inf, qflux, dir_val)
        return x, (x, code, rob_c, tg, dt, t_inf, qflux)

    def bwd(res, g):
        x, code, rob_c, tg, dt, t_inf, qflux = res
        mv = (lambda t: t) if axis == 0 else \
             (lambda t: jnp.moveaxis(t, 1, 0)) if axis == 1 else \
             (lambda t: jnp.transpose(t, (2, 0, 1)))
        xf, gf = mv(x), mv(g)
        # axis-2 codes are plan-stored ALREADY solve-axis-leading
        code_f = (code if axis == 2 else mv(code)).astype(jnp.int32)
        dtype = x.dtype
        tg = jnp.asarray(tg, dtype)
        dt = jnp.asarray(dt, dtype)
        t_inf = jnp.asarray(t_inf, dtype)
        rob_c = jnp.asarray(rob_c, dtype)
        qf = mv(qflux) if has_q else jnp.zeros_like(xf)

        low = (code_f & 1) > 0
        high = (code_f & 2) > 0
        pin = (code_f & 4) > 0
        lowf = low.astype(dtype)
        highf = high.astype(dtype)
        nfaces = ((2.0 - lowf - highf)
                  * ((code_f & 8) > 0).astype(dtype))  # exposed faces/axis
        cf = rob_c * nfaces                            # pin rows: nfaces = 0
        a = jnp.where(low, -tg, 0.0).astype(dtype)
        c = jnp.where(high, -tg, 0.0).astype(dtype)
        b = jnp.where(pin, 1.0,
                      1.0 + tg * (lowf + highf) + dt * cf).astype(dtype)

        y = thomas(_shift_dn(c), b, _shift_up(a), gf)

        unp = ~pin
        rhs_bar = jnp.where(pin, 0.0, y)
        qflux_bar = dt * rhs_bar
        dval_bar = jnp.where(pin, y, 0.0)
        coeff_bar = jnp.where(unp, dt * y * (t_inf - xf), 0.0)
        rob_c_bar = jnp.sum(coeff_bar * nfaces).astype(dtype)

        x_lo = _shift_dn(xf)
        x_hi = _shift_up(xf)
        tg_bar = -jnp.sum(jnp.where(
            unp, y * ((lowf + highf) * xf - lowf * x_lo - highf * x_hi), 0.0))
        dt_bar = jnp.sum(jnp.where(unp, y * (qf + cf * (t_inf - xf)), 0.0))
        t_inf_bar = jnp.sum(jnp.where(unp, y * dt * cf, 0.0))

        mvb = (lambda t: t) if axis == 0 else \
              (lambda t: jnp.moveaxis(t, 0, 1)) if axis == 1 else \
              (lambda t: jnp.transpose(t, (1, 2, 0)))
        q_bar = (mvb(qflux_bar) if has_q else jnp.zeros((), dtype))
        d_bar = (mvb(dval_bar) if has_d else jnp.zeros((), dtype))
        return (mvb(rhs_bar), _f0(code), rob_c_bar,
                tg_bar.astype(dtype), dt_bar.astype(dtype),
                t_inf_bar.astype(dtype), q_bar, d_bar)

    solve.defvjp(fwd, bwd)
    return solve


def sweep_solve_lite(rhs, code, rob_c, tg, dt, t_inf, qflux=None,
                     dir_val=None, *, axis: int = 0,
                     interpret: bool = False):
    """Differentiable plan-lite fused sweep (no coefficient field; scalar
    ``rob_c = h/(rho cp d_axis)`` for THIS sweep's axis — callers index a
    per-axis triple).  ``axis=2``: NATURAL-layout z solve (rhs (x, y, z),
    code (z, x, y)) — no qflux/dir_val, f32 states only."""
    dtype = rhs.dtype
    has_q, has_d = qflux is not None, dir_val is not None
    if axis == 2 and (has_q or has_d):
        raise ValueError("the natural-layout z solve (axis=2) takes no "
                         "qflux/dir_val — use the transposed axis-0 form")
    zero = jnp.zeros((), dtype)
    return _sweep_solve_lite(axis, interpret, has_q, has_d)(
        rhs, code, jnp.asarray(rob_c, dtype), jnp.asarray(tg, dtype),
        jnp.asarray(dt, dtype), jnp.asarray(t_inf, dtype),
        qflux if has_q else zero, dir_val if has_d else zero)


@functools.cache
def _fused_theta_solve_lite(interpret: bool):
    """Differentiable fused theta+x-sweep (solvers/pallas_theta_sweep.py):
    ``x = A^{-1} d`` with ``d = (I + c_exp L) T + dt*cf*t_inf`` and A the
    plan-lite masked tridiagonal along axis 0.  Pullback: transposed solve
    ``A^T y = g`` then the symmetric stencil for ``T_bar = (I + c_exp L) y``;
    scalar cotangents follow _sweep_solve_lite plus the stencil's c/inv
    terms (per-axis unit-Laplacian passes)."""
    from .pallas_stencil import theta_rhs
    from .pallas_theta_sweep import fused_theta_sweep_axis0

    @jax.custom_vjp
    def solve(T, code, c_exp, inv_d2, rob_c, tg, dt, t_inf):
        return fused_theta_sweep_axis0(T, code, c_exp, inv_d2, tg, dt,
                                       t_inf, rob_c, interpret=interpret)

    def fwd(T, code, c_exp, inv_d2, rob_c, tg, dt, t_inf):
        x = solve(T, code, c_exp, inv_d2, rob_c, tg, dt, t_inf)
        return x, (x, T, code, c_exp, inv_d2, rob_c, tg, dt, t_inf)

    def bwd(res, g):
        x, T, code, c_exp, inv_d2, rob_c, tg, dt, t_inf = res
        dtype = x.dtype
        cdt = jnp.promote_types(dtype, jnp.float32)
        code_f = code.astype(jnp.int32)
        low = (code_f & 1) > 0
        high = (code_f & 2) > 0
        lowf = low.astype(dtype)
        highf = high.astype(dtype)
        inm = (code_f & 8) > 0
        nfaces = (2.0 - lowf - highf) * inm.astype(dtype)
        cf = (rob_c * nfaces).astype(dtype)
        a = jnp.where(low, -tg, 0.0).astype(dtype)
        c = jnp.where(high, -tg, 0.0).astype(dtype)
        b = (1.0 + tg * (lowf + highf) + dt * cf).astype(dtype)

        y = thomas(_shift_dn(c), b, _shift_up(a), g)    # A^T y = g

        mask_i8 = inm.astype(jnp.int8)
        inv3 = jnp.broadcast_to(jnp.asarray(inv_d2, cdt), (3,))
        # d(T) = (I + c_exp L) T with L the symmetric masked Laplacian
        T_bar = theta_rhs(y.astype(dtype), mask_i8, jnp.asarray(c_exp, cdt),
                          inv3, interpret=interpret)
        rob_c_bar = jnp.sum(dt * y * (t_inf - x) * nfaces).astype(cdt)
        x_lo = _shift_dn(x)
        x_hi = _shift_up(x)
        tg_bar = -jnp.sum(
            y * ((lowf + highf) * x - lowf * x_lo - highf * x_hi)).astype(cdt)
        dt_bar = jnp.sum(y * cf * (t_inf - x)).astype(cdt)
        t_inf_bar = jnp.sum(y * dt * cf).astype(cdt)
        # c_exp / inv_d2 cotangents via per-axis unit-Laplacian passes
        one = jnp.ones((), cdt)
        gi = jnp.stack([
            jnp.vdot(y, theta_rhs(
                T, mask_i8, one,
                jnp.zeros((3,), cdt).at[ax].set(1.0),
                interpret=interpret) - T).astype(cdt)
            for ax in range(3)])
        inv_bar = (jnp.asarray(c_exp, cdt) * gi).astype(cdt)
        c_bar = jnp.sum(inv3 * gi).astype(cdt)
        return (T_bar, _f0(code), c_bar, inv_bar, rob_c_bar, tg_bar,
                dt_bar, t_inf_bar)

    solve.defvjp(fwd, bwd)
    return solve


def fused_theta_solve_lite(T, code, c_exp, inv_d2, rob_c, tg, dt, t_inf, *,
                           interpret: bool = False):
    """Differentiable fused explicit-theta-pass + plan-lite x-sweep."""
    cdt = jnp.promote_types(T.dtype, jnp.float32)
    return _fused_theta_solve_lite(interpret)(
        T, code, jnp.asarray(c_exp, cdt),
        jnp.broadcast_to(jnp.asarray(inv_d2, cdt), (3,)),
        jnp.asarray(rob_c, cdt), jnp.asarray(tg, cdt), jnp.asarray(dt, cdt),
        jnp.asarray(t_inf, cdt))


@functools.cache
def _theta_rhs_diff(interpret: bool):
    from .pallas_stencil import theta_rhs

    @jax.custom_vjp
    def f(T, mask_i8, c, inv_dx2):
        return theta_rhs(T, mask_i8, c, inv_dx2, interpret=interpret)

    def fwd(T, mask_i8, c, inv_dx2):
        return f(T, mask_i8, c, inv_dx2), (T, mask_i8, c, inv_dx2)

    def bwd(res, g):
        T, mask_i8, c, inv_dx2 = res
        dtype = T.dtype
        c = jnp.asarray(c, dtype)
        inv3 = jnp.broadcast_to(jnp.asarray(inv_dx2, dtype), (3,))
        # (I + cL)^T = I + cL (L symmetric): pull back with the stencil
        T_bar = theta_rhs(g, mask_i8, c, inv3, interpret=interpret)
        one = jnp.ones((), dtype)
        if jnp.ndim(res[3]) == 0:
            # scalar spacing (cubic voxels): the algebraic identity needs
            # only ONE extra stencil pass — c_bar = <g, L T> and
            # inv_bar = c_bar * c / inv (L scales linearly with inv)
            lapT = theta_rhs(T, mask_i8, one, inv3,
                             interpret=interpret) - T
            c_bar = jnp.vdot(g, lapT).astype(dtype)
            inv_bar = (c_bar * c / inv3[0]).astype(dtype)
        else:
            # per-axis spacing: d out/d inv_i = c * Lhat_i T via one-hot
            # unit passes; c_bar = sum_i inv_i <g, Lhat_i T> reuses them
            gi = jnp.stack([
                jnp.vdot(g, theta_rhs(
                    T, mask_i8, one,
                    jnp.zeros((3,), dtype).at[ax].set(1.0),
                    interpret=interpret) - T).astype(dtype)
                for ax in range(3)])
            inv_bar = (c * gi).astype(dtype)
            c_bar = jnp.sum(inv3 * gi).astype(dtype)
        return T_bar, _f0(mask_i8), c_bar, inv_bar

    f.defvjp(fwd, bwd)
    return f


def theta_rhs_diff(T, mask_i8, c, inv_dx2, *, interpret: bool = False):
    """Differentiable fused explicit theta-pass."""
    dtype = T.dtype
    return _theta_rhs_diff(interpret)(T, mask_i8, jnp.asarray(c, dtype),
                                      jnp.asarray(inv_dx2, dtype))


# ---------------------------------------------------------------------------
# Variable-property STREAM kernels (solvers/pallas_vpfields.py): the
# cylindrical varprop tier.  System per line (leading axis), streams
# (rhs, fhi, dw, sink, srhs) + static geometry columns glo/ghi:
#
#   flo_i = fhi_{i-1} (flo_0 = 0),
#   a_i = -dw_i glo_i flo_i,  c_i = -dw_i ghi_i fhi_i,
#   b_i = 1 + dw_i (glo_i flo_i + ghi_i fhi_i + sink_i),
#   d_i = rhs_i + dw_i srhs_i.
#
# Pullback: y = A^{-T} g (transposed Thomas, scan), then for any stream p
# p_bar = y^T (dd/dp) - y^T (dA/dp) x — all elementwise contractions:
#   rhs_bar  = y
#   srhs_bar = y dw
#   dw_bar   = y [glo flo (x_dn - x) + ghi fhi (x_up - x) - sink x + srhs]
#   sink_bar = -y dw x
#   fhi_bar_i = dw_i ghi_i y_i (x_{i+1} - x_i)
#             + dw_{i+1} glo_{i+1} y_{i+1} (x_i - x_{i+1})
# (geometry columns are static numpy — zero cotangents).
# ---------------------------------------------------------------------------


@functools.cache
def _vp_sweep_solve(interpret: bool, nat: bool = False):
    from .pallas_vpfields import fused_vp_fields_sweep

    @jax.custom_vjp
    def solve(rhs, fhi, dw, sink, srhs, glo, ghi):
        return fused_vp_fields_sweep(rhs, fhi, dw, sink, srhs, glo, ghi,
                                     interpret=interpret, nat_rhs_out=nat)

    def fwd(rhs, fhi, dw, sink, srhs, glo, ghi):
        x = solve(rhs, fhi, dw, sink, srhs, glo, ghi)
        return x, (x, fhi, dw, sink, srhs, glo, ghi)

    def bwd(res, g):
        x, fhi, dw, sink, srhs, glo, ghi = res
        if nat:     # bwd math in the solve-axis-leading layout
            x = jnp.transpose(x, (2, 0, 1))
            g = jnp.transpose(g, (2, 0, 1))
        col = lambda v: v[:, None, None]
        flo = _shift_dn(fhi)
        a = -dw * col(glo) * flo
        c = -dw * col(ghi) * fhi
        b = 1.0 + dw * (col(glo) * flo + col(ghi) * fhi + sink)
        # transposed system: a_t[i] = c[i-1], c_t[i] = a[i+1]
        y = thomas(_shift_dn(c), b, _shift_up(a), g)
        x_dn, x_up = _shift_dn(x), _shift_up(x)
        y_up = _shift_up(y)
        dw_bar = y * (col(glo) * flo * (x_dn - x)
                      + col(ghi) * fhi * (x_up - x) - sink * x + srhs)
        sink_bar = -y * dw * x
        fhi_bar = (dw * col(ghi) * y * (x_up - x)
                   + _shift_up(dw * col(glo)) * y_up * (x - x_up))
        srhs_bar = y * dw                      # z-leading, like the stream
        if nat:
            y = jnp.transpose(y, (1, 2, 0))    # rhs cotangent back natural
        return (y, fhi_bar, dw_bar, sink_bar, srhs_bar,
                jnp.zeros_like(glo), jnp.zeros_like(ghi))

    solve.defvjp(fwd, bwd)
    return solve


def vp_sweep_solve(rhs, fhi, dw, sink, srhs, glo, ghi, *,
                   interpret: bool = False, nat_rhs_out: bool = False):
    """Differentiable fused_vp_fields_sweep: primal on the compressed
    stream kernel, pullback via the transposed scan Thomas (module note).
    ``nat_rhs_out``: rhs/solution in the NATURAL (B1, B2, n) layout (the
    streams stay solve-axis-leading); cotangents follow the layouts."""
    return _vp_sweep_solve(interpret, nat_rhs_out)(
        rhs, fhi, dw, sink, srhs, glo, ghi)


@functools.cache
def _vp_cyclic_solve(interpret: bool):
    from .pallas_vpfields import fused_vp_fields_cyclic_axis1
    from .thomas import cyclic_thomas

    @jax.custom_vjp
    def solve(rhs, flo, dw, sink, srhs, geo):
        # hi faces derived IN-KERNEL from flo by periodicity — no roll
        # pass, no second face stream (~12 B/cell)
        return fused_vp_fields_cyclic_axis1(rhs, flo, None, dw, sink, srhs,
                                            geo, interpret=interpret)

    def fwd(rhs, flo, dw, sink, srhs, geo):
        x = solve(rhs, flo, dw, sink, srhs, geo)
        return x, (x, flo, dw, sink, srhs, geo)

    def bwd(res, g):
        x, flo, dw, sink, srhs, geo = res
        fhi = jnp.roll(flo, -1, axis=1)   # periodic hi faces (bwd only)
        gg = geo[:, None, :]
        a = -dw * gg * flo
        c = -dw * gg * fhi
        b = 1.0 + dw * (gg * (flo + fhi) + sink)
        rup = lambda v: jnp.roll(v, -1, axis=1)    # v_{i+1}, periodic
        rdn = lambda v: jnp.roll(v, 1, axis=1)     # v_{i-1}, periodic
        # transposed cyclic system: a_t[i] = c[i-1], c_t[i] = a[i+1]
        t1 = lambda v: jnp.moveaxis(v, 1, 0)
        y = jnp.moveaxis(cyclic_thomas(t1(rdn(c)), t1(b), t1(rup(a)),
                                       t1(g)), 0, 1)
        x_dn, x_up = rdn(x), rup(x)
        dw_bar = y * (gg * (flo * (x_dn - x) + fhi * (x_up - x))
                      - sink * x + srhs)
        sink_bar = -y * dw * x
        flo_bar = y * dw * gg * (x_dn - x)
        fhi_bar = y * dw * gg * (x_up - x)
        geo_bar = jnp.sum(y * dw * (flo * (x_dn - x) + fhi * (x_up - x)),
                          axis=1)
        # flo appears directly AND (shifted) as every hi face: fold the
        # fhi cotangent back through the roll's transpose
        return (y, flo_bar + rdn(fhi_bar), dw_bar, sink_bar, y * dw,
                geo_bar)

    solve.defvjp(fwd, bwd)
    return solve


def vp_cyclic_solve(rhs, flo, dw, sink, srhs, geo, *,
                    interpret: bool = False):
    """Differentiable fused_vp_fields_cyclic_axis1 (natural-layout phi,
    hi faces derived in-kernel from flo by periodicity): pullback via the
    transposed cyclic Thomas."""
    return _vp_cyclic_solve(interpret)(rhs, flo, dw, sink, srhs, geo)


@functools.cache
def _vp2_sweep_solve(interpret: bool, nat: bool, has_d: bool, spec: tuple):
    """Differentiable tier-2 fully-fused sweep (solvers/pallas_vp2.py):
    primal on the derive-everything-from-T kernel; the pullback REBUILDS
    the physical streams from T via the XLA oracle (vp2_streams_xla),
    reuses the vp_sweep_solve transposed-scan math to get their
    cotangents, and chains them back through the property/film
    evaluations with jax.vjp of the builder."""
    from .pallas_vp2 import fused_vp2_sweep, vp2_streams_xla

    (k_spec, cp_spec, h_lo, h_hi, tv, eps, e0, e1) = spec
    kw = dict(k_spec=k_spec, cp_spec=cp_spec, h_lo=h_lo, h_hi=h_hi,
              tinf_void=tv, emissivity=eps, edge0=e0, edge1=e1)

    @jax.custom_vjp
    def solve(rhs, T, code, glo, ghi, gsl, gsh, dtor):
        return fused_vp2_sweep(rhs if has_d else None, T, code, glo, ghi,
                               gsl, gsh, dtor, nat_rhs_out=nat,
                               interpret=interpret, **kw)

    def fwd(rhs, T, code, glo, ghi, gsl, gsh, dtor):
        x = solve(rhs, T, code, glo, ghi, gsl, gsh, dtor)
        return x, (x, T, code, glo, ghi, gsl, gsh, dtor)

    def bwd(res, g):
        x, T, code, glo, ghi, gsl, gsh, dtor = res
        t2 = lambda v: jnp.transpose(v, (2, 0, 1))
        Ts = t2(T) if nat else T       # solve-axis-leading for the math
        if nat:
            x = t2(x)
            g = t2(g)
        build = lambda T_, d_: vp2_streams_xla(T_, code, gsl, gsh, d_,
                                               **kw)
        (fhi, dw, sink, srhs), pull = jax.vjp(build, Ts, dtor)
        col = lambda v: v[:, None, None]
        flo = _shift_dn(fhi)
        a = -dw * col(glo) * flo
        c = -dw * col(ghi) * fhi
        b = 1.0 + dw * (col(glo) * flo + col(ghi) * fhi + sink)
        y = thomas(_shift_dn(c), b, _shift_up(a), g)
        x_dn, x_up = _shift_dn(x), _shift_up(x)
        y_up = _shift_up(y)
        dw_bar = y * (col(glo) * flo * (x_dn - x)
                      + col(ghi) * fhi * (x_up - x) - sink * x + srhs)
        sink_bar = -y * dw * x
        fhi_bar = (dw * col(ghi) * y * (x_up - x)
                   + _shift_up(dw * col(glo)) * y_up * (x - x_up))
        T_bar, dtor_bar = pull((fhi_bar, dw_bar, sink_bar, y * dw))
        if nat:
            y = jnp.transpose(y, (1, 2, 0))
            T_bar = jnp.transpose(T_bar, (1, 2, 0))
        if has_d:
            rhs_bar = y
        else:
            rhs_bar = jnp.zeros((), x.dtype)   # dummy slot
            T_bar = T_bar + y                  # the rhs IS T
        return (rhs_bar, T_bar, _f0(code), jnp.zeros_like(glo),
                jnp.zeros_like(ghi), jnp.zeros_like(gsl),
                jnp.zeros_like(gsh), dtor_bar)

    solve.defvjp(fwd, bwd)
    return solve


def vp2_sweep_solve(rhs, T, code, glo, ghi, gsl, gsh, dtor, *, spec,
                    interpret: bool = False, nat_rhs_out: bool = False):
    """Differentiable fused_vp2_sweep.  ``spec`` is the hashable static
    tuple (k_spec, cp_spec, h_lo, h_hi, tinf_void, emissivity, edge0,
    edge1); ``rhs=None`` means the rhs IS T (first BE sweep)."""
    has_d = rhs is not None
    fn = _vp2_sweep_solve(interpret, nat_rhs_out, has_d, spec)
    if not has_d:
        rhs = jnp.zeros((), T.dtype)
    return fn(rhs, T, code, glo, ghi, gsl, gsh, dtor)


@functools.cache
def _vp2_cyclic_solve(interpret: bool, spec: tuple):
    from .pallas_vp2 import fused_vp2_cyclic_axis1, vp2_cyclic_streams_xla
    from .thomas import cyclic_thomas

    (k_spec, cp_spec, h_void, tv, eps) = spec
    kw = dict(k_spec=k_spec, cp_spec=cp_spec, h_void=h_void, tinf_void=tv,
              emissivity=eps)

    @jax.custom_vjp
    def solve(rhs, T, code, geo2, gs2, dtor):
        return fused_vp2_cyclic_axis1(rhs, T, code, geo2, gs2, dtor,
                                      interpret=interpret, **kw)

    def fwd(rhs, T, code, geo2, gs2, dtor):
        x = solve(rhs, T, code, geo2, gs2, dtor)
        return x, (x, T, code, geo2, gs2, dtor)

    def bwd(res, g):
        x, T, code, geo2, gs2, dtor = res
        build = lambda T_, d_: vp2_cyclic_streams_xla(T_, code, gs2, d_,
                                                      **kw)
        (flo, dw, sink, srhs), pull = jax.vjp(build, T, dtor)
        fhi = jnp.roll(flo, -1, axis=1)     # periodic hi faces (bwd only)
        gg = geo2[:, None, :]
        a = -dw * gg * flo
        c = -dw * gg * fhi
        b = 1.0 + dw * (gg * (flo + fhi) + sink)
        rup = lambda v: jnp.roll(v, -1, axis=1)
        rdn = lambda v: jnp.roll(v, 1, axis=1)
        t1 = lambda v: jnp.moveaxis(v, 1, 0)
        y = jnp.moveaxis(cyclic_thomas(t1(rdn(c)), t1(b), t1(rup(a)),
                                       t1(g)), 0, 1)
        x_dn, x_up = rdn(x), rup(x)
        dw_bar = y * (gg * (flo * (x_dn - x) + fhi * (x_up - x))
                      - sink * x + srhs)
        sink_bar = -y * dw * x
        flo_bar = y * dw * gg * (x_dn - x)
        fhi_bar = y * dw * gg * (x_up - x)
        T_bar, dtor_bar = pull((flo_bar + rdn(fhi_bar), dw_bar, sink_bar,
                                y * dw))
        return (y, T_bar, _f0(code), jnp.zeros_like(geo2),
                jnp.zeros_like(gs2), dtor_bar)

    solve.defvjp(fwd, bwd)
    return solve


def vp2_cyclic_solve(rhs, T, code, geo2, gs2, dtor, *, spec,
                     interpret: bool = False):
    """Differentiable fused_vp2_cyclic_axis1 (natural-layout phi).
    ``spec`` = (k_spec, cp_spec, h_void, tinf_void, emissivity)."""
    return _vp2_cyclic_solve(interpret, spec)(rhs, T, code, geo2, gs2,
                                              dtor)
