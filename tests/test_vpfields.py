"""Unit tests for the compressed variable-property field kernels
(solvers/pallas_vpfields.py) — interpret mode vs the scan solvers, hostile
(pad-everything) shapes, boundary semantics carried by the data."""
import numpy as np

import jax
import jax.numpy as jnp

from adi_thermal_fields_tpu.solvers.pallas_vpfields import (
    fused_vp_fields_cyclic_axis1, fused_vp_fields_sweep)
from adi_thermal_fields_tpu.solvers.thomas import cyclic_thomas, thomas


def _open_reference(rhs, fhi, dw, sink, srhs, glo, ghi):
    flo = jnp.concatenate([jnp.zeros_like(fhi[:1]), fhi[:-1]], axis=0)
    col = lambda v: v[:, None, None]
    a = -dw * col(glo) * flo
    c = -dw * col(ghi) * fhi
    b = 1.0 + dw * (col(glo) * flo + col(ghi) * fhi + sink)
    return thomas(a, b, c, rhs + dw * srhs)


def test_open_sweep_matches_thomas_with_voids_and_pins():
    rng = np.random.default_rng(0)
    n, b1, b2 = 20, 5, 17   # hostile: row, sublane and lane padding
    rhs = jnp.asarray(rng.random((n, b1, b2)))
    fhi = np.asarray(30 + 40 * rng.random((n, b1, b2)))
    fhi[-1] = 0.0                       # domain edge
    void = rng.random((n, b1, b2)) > 0.8
    fhi[void] = 0.0                     # faces zero across void
    fhi[:-1][void[1:]] = 0.0
    fhi = jnp.asarray(fhi)
    dw = jnp.asarray(1e-3 * rng.random((n, b1, b2)))
    sink = np.zeros((n, b1, b2))
    sink[0], sink[-1] = 55.0, 12.0      # Robin end rows
    sink[void] = 0.0
    srhs = sink * 20.0
    sink, srhs = jnp.asarray(sink), jnp.asarray(srhs)
    glo = jnp.asarray(1.0 + rng.random(n))
    ghi = jnp.asarray(1.0 + rng.random(n))

    # dirichlet end row via zeroed geometry + pinned rhs
    glo = glo.at[n - 1].set(0.0)
    ghi = ghi.at[n - 1].set(0.0)
    rhs = rhs.at[n - 1].set(123.0)
    sink = sink.at[n - 1].set(0.0)
    srhs = srhs.at[n - 1].set(0.0)

    ref = _open_reference(rhs, fhi, dw, sink, srhs, glo, ghi)
    out = fused_vp_fields_sweep(rhs, fhi, dw, sink, srhs, glo, ghi,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[n - 1]), 123.0)
    # void rows are identities holding rhs
    v = np.asarray(void) & (np.arange(n)[:, None, None] != n - 1)
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(rhs)[v])


def test_cyclic_axis1_matches_cyclic_thomas():
    rng = np.random.default_rng(1)
    b1, n, b2 = 5, 24, 19
    rhs = jnp.asarray(rng.random((b1, n, b2)))
    flo_np = np.asarray(30 + 40 * rng.random((b1, n, b2)))
    void = rng.random((b1, n, b2)) > 0.85
    for sh in (0, 1):                   # faces zero across void, periodic
        flo_np[np.roll(void, sh, axis=1)] = 0.0
    flo = jnp.asarray(flo_np)
    fhi = jnp.roll(flo, -1, axis=1)
    dw = jnp.asarray(1e-3 * rng.random((b1, n, b2)))
    sink = jnp.asarray(np.where(rng.random((b1, n, b2)) > 0.7, 25.0, 0.0)
                       * ~void)
    srhs = sink * 20.0
    geo = jnp.asarray(0.5 + rng.random((b1, b2)))

    g = geo[:, None, :]
    a = -dw * g * flo
    c = -dw * g * fhi
    b = 1.0 + dw * (g * (flo + fhi) + sink)
    t1 = lambda x: jnp.moveaxis(x, 1, 0)
    ref = jnp.moveaxis(cyclic_thomas(t1(a), t1(b), t1(c),
                                     t1(rhs + dw * srhs)), 0, 1)
    out = fused_vp_fields_cyclic_axis1(rhs, flo, fhi, dw, sink, srhs, geo,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)

    # all-zero face lines are identities (full-disk axis rows, void lines)
    z = jnp.zeros_like(flo)
    out0 = fused_vp_fields_cyclic_axis1(rhs, z, z, dw, jnp.zeros_like(sink),
                                        jnp.zeros_like(srhs), geo,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(rhs))


def test_pipelined_variant_matches_streaming():
    """The cross-grid-step pipelined form (short lines) computes exactly
    what the streaming form does, including the face-lag carry and the
    whole boundary-semantics-in-data contract."""
    rng = np.random.default_rng(2)
    n, b1, b2 = 24, 20, 300   # multiple batch tiles; n fits one chunk
    rhs = jnp.asarray(rng.random((n, b1, b2)))
    fhi = np.asarray(30 + 40 * rng.random((n, b1, b2)))
    fhi[-1] = 0.0
    void = rng.random((n, b1, b2)) > 0.85
    fhi[void] = 0.0
    fhi[:-1][void[1:]] = 0.0
    fhi = jnp.asarray(fhi)
    dw = jnp.asarray(1e-3 * rng.random((n, b1, b2)))
    sink = jnp.asarray(np.where(rng.random((n, b1, b2)) > 0.8, 35.0, 0.0)
                       * ~void)
    srhs = sink * 20.0
    glo = jnp.asarray(1.0 + rng.random(n)).at[0].set(0.0)
    ghi = jnp.asarray(1.0 + rng.random(n)).at[n - 1].set(0.0)

    a = fused_vp_fields_sweep(rhs, fhi, dw, sink, srhs, glo, ghi,
                              interpret=True, pipelined=False)
    b = fused_vp_fields_sweep(rhs, fhi, dw, sink, srhs, glo, ghi,
                              interpret=True, pipelined=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cyclic_axis1_derived_fhi_matches_streamed():
    """fhi=None derives the hi faces IN-KERNEL from flo by periodicity
    (group-register shift + pre-gathered boundary rows + wrap row) — must
    be bitwise against the streamed-fhi mode, including non-multiple-of-8
    line lengths where the wrap row sits mid-group."""
    rng = np.random.default_rng(5)
    for (b1, n, b2) in ((8, 36, 128), (8, 129, 96), (5, 20, 19)):
        flo_np = np.asarray(0.5 + rng.random((b1, n, b2)))
        void = rng.random((b1, n, b2)) > 0.85
        for sh in (0, 1):
            flo_np[np.roll(void, sh, axis=1)] = 0.0
        flo = jnp.asarray(flo_np)
        fhi = jnp.roll(flo, -1, axis=1)
        dw = jnp.asarray(0.1 * rng.random((b1, n, b2)))
        sink = jnp.asarray(0.01 * rng.random((b1, n, b2)))
        srhs = sink * 20.0
        rhs = jnp.asarray(100 * rng.random((b1, n, b2)))
        geo = jnp.asarray(0.2 + rng.random((b1, b2)))
        want = fused_vp_fields_cyclic_axis1(rhs, flo, fhi, dw, sink, srhs,
                                            geo, interpret=True)
        got = fused_vp_fields_cyclic_axis1(rhs, flo, None, dw, sink, srhs,
                                           geo, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_open_sweep_nat_rhs_out_matches_classic():
    """nat_rhs_out=True reads the rhs from — and writes the solution to —
    the NATURAL (B1, B2, n) layout via in-kernel chunk relayout; bitwise
    against the solve-axis-leading form."""
    rng = np.random.default_rng(9)
    for (n, b1, b2) in ((32, 16, 128), (129, 8, 256), (20, 8, 96)):
        fhi = jnp.asarray(rng.random((n, b1, b2)) + 0.5)
        fhi = fhi.at[n - 1].set(0.0)
        dw = jnp.asarray(0.1 * rng.random((n, b1, b2)))
        sink = jnp.asarray(0.01 * rng.random((n, b1, b2)))
        srhs = sink * 20.0
        rhs_z = jnp.asarray(100 * rng.random((n, b1, b2)))
        glo = jnp.asarray(0.1 + rng.random(n))
        ghi = jnp.asarray(0.1 + rng.random(n))
        want = fused_vp_fields_sweep(rhs_z, fhi, dw, sink, srhs, glo, ghi,
                                     interpret=True, pipelined=False)
        got = fused_vp_fields_sweep(jnp.transpose(rhs_z, (1, 2, 0)), fhi,
                                    dw, sink, srhs, glo, ghi,
                                    interpret=True, nat_rhs_out=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.transpose(want, (1, 2, 0))))


def test_varprop_sweep_nat_rhs_out_matches_classic():
    """Cartesian varprop z kernel: natural rhs/out mode vs the transposed
    chain (f32; the h-stream and scalar-h variants)."""
    from adi_thermal_fields_tpu.solvers.pallas_varprop import (
        fused_varprop_sweep)
    from adi_thermal_fields_tpu.solvers.pallas_sweeps import sweep_code

    rng = np.random.default_rng(13)
    for (n, b1, b2) in ((32, 16, 128), (136, 24, 20)):
        mask = jnp.asarray(rng.random((n, b1, b2)) < 0.85)
        code = sweep_code(mask, None, 0)
        fc = jnp.asarray((rng.random((n, b1, b2)) + 0.5)
                         * np.asarray(mask), jnp.float32)
        w = jnp.asarray(rng.random((n, b1, b2)) + 0.1, jnp.float32)
        rhs = jnp.asarray(100 * rng.random((n, b1, b2)), jnp.float32)
        h = jnp.asarray(rng.random((n, b1, b2)) * 40, jnp.float32)
        for hx, rc in ((None, 25.0), (h, 0.0)):
            want = fused_varprop_sweep(rhs, code, fc, w, 0.3, 0.01, 20.0,
                                       h=hx, rob_c=rc, interpret=True)
            got = fused_varprop_sweep(
                jnp.transpose(rhs, (1, 2, 0)), code, fc, w, 0.3, 0.01,
                20.0, h=hx, rob_c=rc, interpret=True, nat_rhs_out=True)
            # nat mode's 128-aligned chunking can pad n, moving the last
            # REAL row's completion from the epilogue into the pipeline —
            # same math, different rounding order (measured 3e-16 rel at
            # f64), hence a tolerance instead of exact equality
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(jnp.transpose(want, (1, 2, 0))),
                rtol=3e-6, atol=1e-4)


def test_masked_sweep_nat_rhs_out_matches_classic():
    """Masked const-prop kernel (pallas_fields.fused_masked_sweep):
    natural rhs/out mode vs the transposed chain, folded-prefold mode."""
    from adi_thermal_fields_tpu.solvers.pallas_fields import (
        fused_masked_sweep)

    rng = np.random.default_rng(21)
    for (n, b1, b2) in ((32, 16, 128), (136, 24, 20)):
        code_np = np.zeros((n, b1, b2), np.int8)
        live = rng.random((n, b1, b2)) < 0.85
        code_np[live] = 8                           # in-mask
        code_np[1:][live[1:] & live[:-1]] |= 1      # low coupling
        code_np[:-1][live[1:] & live[:-1]] |= 2     # high coupling
        code = jnp.asarray(code_np)
        sink = jnp.asarray(0.01 * rng.random((n, b1, b2)) * live,
                           jnp.float32)
        srhs = sink * 20.0
        rhs = jnp.asarray(100 * rng.random((n, b1, b2)), jnp.float32)
        glo = jnp.asarray(0.1 + rng.random(n), jnp.float32)
        ghi = jnp.asarray(0.1 + rng.random(n), jnp.float32)
        want = fused_masked_sweep(rhs, code, sink, glo, ghi, 0.05, srhs,
                                  20.0, interpret=True, pipelined=False)
        got = fused_masked_sweep(jnp.transpose(rhs, (1, 2, 0)), code, sink,
                                 glo, ghi, 0.05, srhs, 20.0,
                                 interpret=True, nat_rhs_out=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jnp.transpose(want, (1, 2, 0))),
            rtol=3e-6, atol=1e-4)
