"""Fused explicit-theta-pass + x-sweep kernel (solvers/pallas_theta_sweep).

The kernel must be BITWISE identical to the unfused stencil + lite-sweep
chain (it reproduces the stencil's accumulation order term-for-term), and
its custom VJP must match jax.grad of the scan reference path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adi_thermal_fields_tpu import CartesianGrid, Material
from adi_thermal_fields_tpu.solvers.pallas_stencil import theta_rhs
from adi_thermal_fields_tpu.solvers.pallas_sweeps import (
    fused_sweep_axis0_v2, sweep_code)
from adi_thermal_fields_tpu.solvers.pallas_theta_sweep import (
    fused_theta_sweep_axis0)


def _case(shape, seed=0, frac=0.25):
    rng = np.random.default_rng(seed)
    mask = rng.random(shape) > frac
    T = np.where(mask, 900.0 + 50 * rng.standard_normal(shape), 20.0)
    return jnp.asarray(mask), T


@pytest.mark.parametrize("shape,dtype", [
    ((24, 16, 256), jnp.float32),
    ((40, 24, 384), jnp.float64),
    ((17, 13, 130), jnp.float32),   # hostile: pads rows, sublanes, lanes
    ((128, 8, 128), jnp.float64),   # multi-chunk line
])
def test_fused_theta_sweep_bitwise(shape, dtype):
    maskj, T_np = _case(shape)
    T = jnp.asarray(T_np, dtype)
    code_s = sweep_code(maskj, None, 0, stencil_bits=True)
    code_p = sweep_code(maskj, None, 0)
    # the 8-bit code's low nibble is exactly the 4-bit code
    np.testing.assert_array_equal(np.asarray(code_s, np.int32) & 15,
                                  np.asarray(code_p, np.int32) & 15)
    c_exp, tg, dt, t_inf, rob = 0.013, 0.21, 0.05, 20.0, 0.0031
    iv = (1.0e6, 1.1e6, 0.9e6)
    R0 = theta_rhs(T, maskj.astype(jnp.int8), jnp.asarray(c_exp, dtype),
                   jnp.asarray(iv, dtype), interpret=True)
    U_ref = fused_sweep_axis0_v2(
        R0, code_p, None, jnp.asarray(tg, dtype), jnp.asarray(dt, dtype),
        jnp.asarray(t_inf, dtype), rob_c=jnp.asarray(rob, dtype),
        interpret=True)
    U = fused_theta_sweep_axis0(
        T, code_s, jnp.asarray(c_exp, dtype), jnp.asarray(iv, dtype),
        jnp.asarray(tg, dtype), jnp.asarray(dt, dtype),
        jnp.asarray(t_inf, dtype), jnp.asarray(rob, dtype), interpret=True)
    np.testing.assert_array_equal(np.asarray(U), np.asarray(U_ref))


def test_fused_theta_sweep_ring_bf16_mixed():
    """Ring kernel in the bf16-state / f32-solve mode matches the unfused
    bf16 chain (stencil theta_rhs + one-sided mixed sweep) to a bf16
    quantum; also A/B the ring formulation against the halo-DMA variant
    (ring=False) at f32 — identical math, different DMA scheme."""
    shape = (40, 24, 256)
    maskj, T_np = _case(shape)
    code_s = sweep_code(maskj, None, 0, stencil_bits=True)
    code_p = sweep_code(maskj, None, 0)
    c_exp, tg, dt, t_inf, rob = 0.013, 0.21, 0.05, 20.0, 0.0031
    iv = (1.0e6, 1.1e6, 0.9e6)
    Tb = jnp.asarray(T_np, jnp.bfloat16)
    U = fused_theta_sweep_axis0(Tb, code_s, c_exp, iv, tg, dt, t_inf, rob,
                                interpret=True)
    assert U.dtype == jnp.bfloat16
    # f64 oracle from the same bf16 input.  The fused kernel carries the
    # theta RHS at f32 straight into the solve; the unfused chain rounds
    # R0 to bf16 between kernels, which under this test's hostile 1e6
    # metric factors (heavy cancellation in the solve) loses up to ~30x
    # relative accuracy (measured) — so the fused path is compared to the
    # ORACLE, and the unfused chain is only required to be no better.
    T64 = jnp.asarray(np.asarray(Tb).astype(np.float64))
    R064 = theta_rhs(T64, maskj.astype(jnp.int8), c_exp, iv, interpret=True)
    U64 = fused_sweep_axis0_v2(R064, code_p, None, tg, dt, t_inf,
                               rob_c=rob, interpret=True)
    a = np.asarray(U, np.float64)
    o = np.asarray(U64)
    rel = np.abs(a - o) / np.maximum(np.abs(o), 1.0)
    assert float(rel.max()) < 0.01   # few bf16 output quanta only
    # f32 A/B: ring vs halo-DMA variant must be bitwise (same op order)
    Tf = jnp.asarray(T_np, jnp.float32)
    a = fused_theta_sweep_axis0(Tf, code_s, c_exp, iv, tg, dt, t_inf, rob,
                                ring=True, interpret=True)
    b = fused_theta_sweep_axis0(Tf, code_s, c_exp, iv, tg, dt, t_inf, rob,
                                ring=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adi_step_pallas_uses_fused_path_bitwise():
    """The full lite step through adi_step_pallas (which now takes the fused
    theta+x-sweep fast path) must stay bitwise equal to the scan reference
    semantics within f64 tolerance."""
    from adi_thermal_fields_tpu import adi_step_cartesian, build_coeff_packs
    from adi_thermal_fields_tpu.step.cartesian_pallas import (
        adi_step_pallas, build_sweep_plan)

    grid = CartesianGrid(24, 16, 130, 1e-3, dy=1.1e-3, dz=0.9e-3)
    mat = Material(7800.0, 490.0, 54.0)
    maskj, T_np = _case(grid.shape, seed=3)
    T = jnp.asarray(T_np, jnp.float64)
    h = 150.0
    rc = tuple(jnp.asarray(h, jnp.float64)
               * jnp.asarray(1.0 / (mat.rho * mat.cp * d), jnp.float64)
               for d in grid.spacing)
    plan = build_sweep_plan(maskj, None, has_neumann=False,
                            has_dirichlet=False, robin_const=rc)
    out = adi_step_pallas(T, plan, grid, mat, dt=jnp.float64(0.05),
                          theta=0.5, t_inf=20.0, interpret=True)
    packs = build_coeff_packs(maskj, grid, mat, robin_h=h,
                              dtype=jnp.float64)
    ref = adi_step_cartesian(T, maskj, packs, grid, mat,
                             dt=jnp.float64(0.05), theta=0.5, t_inf=20.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-10)


def test_fused_theta_solve_grad_matches_scan():
    """jax.grad through the fused theta+x-sweep custom VJP vs the scan
    path, for the field AND every scalar parameter."""
    from adi_thermal_fields_tpu.solvers.differentiable import (
        fused_theta_solve_lite)
    from adi_thermal_fields_tpu.solvers.thomas import thomas
    from adi_thermal_fields_tpu.step.cartesian import masked_laplacian_1d

    shape = (16, 8, 128)
    maskj, T_np = _case(shape, seed=5)
    T = jnp.asarray(T_np, jnp.float64)
    code = sweep_code(maskj, None, 0, stencil_bits=True)
    iv = jnp.asarray((1.0e6, 1.1e6, 0.9e6), jnp.float64)
    w = jnp.asarray(np.random.default_rng(7).standard_normal(shape))

    def scan_ref(T, c_exp, inv3, rob, tg, dt, t_inf):
        lap = sum(masked_laplacian_1d(T, maskj, ax, inv3[ax])
                  for ax in range(3))
        d = T + c_exp * lap
        code_f = code.astype(jnp.int32)
        low = (code_f & 1) > 0
        high = (code_f & 2) > 0
        inm = ((code_f & 8) > 0).astype(T.dtype)
        cf = rob * ((2.0 - low - high) * inm)
        a = jnp.where(low, -tg, 0.0)
        c = jnp.where(high, -tg, 0.0)
        b = 1.0 + tg * (low.astype(T.dtype) + high.astype(T.dtype)) + dt * cf
        return thomas(a, b, c, d + dt * cf * t_inf)

    def loss_fused(*args):
        return jnp.vdot(w, fused_theta_solve_lite(
            args[0], code, args[1], args[2], args[3], args[4], args[5],
            args[6], interpret=True))

    def loss_ref(*args):
        return jnp.vdot(w, scan_ref(*args))

    args = (T, jnp.float64(0.013), iv, jnp.float64(0.0031),
            jnp.float64(0.21), jnp.float64(0.05), jnp.float64(20.0))
    np.testing.assert_allclose(float(loss_fused(*args)),
                               float(loss_ref(*args)), rtol=1e-12)
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12, err_msg=f"arg {i}")
