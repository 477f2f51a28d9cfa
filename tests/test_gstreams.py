"""G-stream varprop tier (solvers/pallas_gstreams.py): parity vs the XLA
scan path and the classic fused tier, h-mode equivalence, routing, and the
bf16 mixed mode — all in Pallas interpret mode on CPU.

The tier is a pure TPU-performance redesign of adi_step_varprop_fused's
flagship configuration (Robin-only BCs, table properties); physics parity
is therefore asserted against BOTH existing formulations at f32 stream
tolerance (the g fields carry theta*dt/d^2*w*fc pre-multiplied, so exact
bitwise equality with the classic tier is not expected — the products
round differently)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adi_thermal_fields_tpu import CartesianGrid, Material
from adi_thermal_fields_tpu.bc.packs import build_coeff_packs
from adi_thermal_fields_tpu.bc.radiation import radiative_h
from adi_thermal_fields_tpu.step.cartesian_varprop import (
    PropertyTable, adi_step_varprop, adi_step_varprop_fused,
    adi_step_varprop_gstreams, apparent_cp, build_varprop_codes)


def _setup(seed=0, T0=800.0, dT=200.0):
    rng = np.random.default_rng(seed)
    nx, ny, nz = 12, 10, 14
    grid = CartesianGrid(nx, ny, nz, 1e-3, dy=1.3e-3, dz=0.8e-3)
    mat = Material(7800.0, 490.0, 54.0)
    mask = np.ones((nx, ny, nz), bool)
    mask[7:, 2:5, :6] = False
    mask[0, :, -3:] = False
    T = jnp.asarray(T0 + dT * rng.random((nx, ny, nz)), jnp.float32)
    kt = PropertyTable((0.0, 500.0, 1200.0), (54.0, 40.0, 30.0))
    ct = apparent_cp(490.0, 620.0, 2.5e5, 900.0, 1000.0)
    return grid, mat, jnp.asarray(mask), T, kt, ct


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))


def test_gstream_step_matches_xla_scan_path():
    """adi_step_varprop_gstreams == adi_step_varprop (xla) for scalar-h
    Robin + volumetric source, theta in {0.5, 1}, anisotropic spacing,
    void mask — and void cells are exact identity rows."""
    grid, mat, mask, T, kt, ct = _setup()
    rng = np.random.default_rng(3)
    src = jnp.asarray(2e7 * rng.random(T.shape), jnp.float32)
    dt = jnp.float32(0.05)
    packs = build_coeff_packs(mask, grid, mat, robin_h=180.0)
    for theta in (0.5, 1.0):
        want = adi_step_varprop(T, mask, packs, grid, mat, k_table=kt,
                                cp_table=ct, dt=dt, theta=theta,
                                t_inf=20.0, source=src,
                                implementation="xla")
        got = adi_step_varprop_gstreams(T, mask, grid, mat, k_table=kt,
                                        cp_table=ct, dt=dt, theta=theta,
                                        t_inf=20.0, robin_h=180.0,
                                        source=src, interpret=True)
        assert _rel(got, want) < 2e-5
        assert float(jnp.max(jnp.abs(
            jnp.where(mask, 0.0, got - T)))) == 0.0


def test_gstream_h_modes_agree():
    """The three film modes agree: streamed per-cell h == the classic
    fused tier fed the same field, and the in-register radiative film ==
    streaming radiative_h(T)."""
    grid, mat, mask, T, kt, ct = _setup(seed=1, T0=1000.0, dT=500.0)
    codes = build_varprop_codes(mask)
    dt = jnp.float32(0.05)
    hf = radiative_h(T, 0.6, 20.0, h_conv=12.0)
    kw = dict(k_table=kt, cp_table=ct, dt=dt, theta=0.5, t_inf=20.0,
              interpret=True)
    classic = adi_step_varprop_fused(T, mask, codes, grid, mat,
                                     h_field=hf, gstreams=False, **kw)
    g_stream = adi_step_varprop_gstreams(T, mask, grid, mat, h_field=hf,
                                         **kw)
    assert _rel(g_stream, classic) < 2e-6
    g_rad = adi_step_varprop_gstreams(T, mask, grid, mat, emissivity=0.6,
                                      h_conv=12.0, **kw)
    assert _rel(g_rad, g_stream) < 2e-6


def test_gstream_routing_and_fallback():
    """adi_step_varprop_fused(gstreams=True) routes bitwise to the g-tier
    when eligible; per-axis anisotropic k tables fall back to the classic
    tier; the classic tier now accepts emissivity directly."""
    grid, mat, mask, T, kt, ct = _setup(seed=1, T0=1000.0, dT=500.0)
    codes = build_varprop_codes(mask)
    dt = jnp.float32(0.05)
    kw = dict(k_table=kt, cp_table=ct, dt=dt, theta=0.5, t_inf=20.0,
              emissivity=0.6, h_conv=12.0, interpret=True)
    direct = adi_step_varprop_gstreams(T, mask, grid, mat, **kw)
    routed = adi_step_varprop_fused(T, mask, codes, grid, mat,
                                    gstreams=True, **kw)
    assert float(jnp.max(jnp.abs(routed - direct))) == 0.0
    # classic tier builds the radiative film itself from emissivity
    classic = adi_step_varprop_fused(T, mask, codes, grid, mat,
                                     gstreams=False, **kw)
    assert _rel(classic, direct) < 2e-6
    # ineligible (per-axis tuple) must fall back, not crash
    aniso = adi_step_varprop_fused(
        T, mask, codes, grid, mat, k_table=(kt, 30.0, kt), cp_table=ct,
        dt=dt, theta=0.5, t_inf=20.0, robin_h=50.0, interpret=True,
        gstreams=True)
    assert bool(jnp.all(jnp.isfinite(aniso)))


def test_gstream_rejects_bad_configs():
    grid, mat, mask, T, kt, ct = _setup()
    dt = jnp.float32(0.05)
    with pytest.raises(ValueError, match="theta"):
        adi_step_varprop_gstreams(T, mask, grid, mat, k_table=kt,
                                  cp_table=ct, dt=dt, theta=0.0,
                                  interpret=True)
    with pytest.raises(ValueError, match="f32/bf16"):
        adi_step_varprop_gstreams(T.astype(jnp.float64), mask, grid, mat,
                                  k_table=kt, cp_table=ct, dt=dt,
                                  theta=0.5, interpret=True)
    with pytest.raises(ValueError, match="PropertyTable"):
        adi_step_varprop_gstreams(T, mask, grid, mat,
                                  k_table=(kt, 30.0, kt), cp_table=ct,
                                  dt=dt, theta=0.5, interpret=True)


def test_gstream_bf16_mixed_mode():
    """bf16 states: within a few bf16 ulps of the CLASSIC tier's bf16 path
    (both solve at f32 and downcast stores; exact equality is not expected
    — the pre-multiplied streams round differently), and stochastic
    rounding raises in interpret mode rather than silently skipping."""
    grid, mat, mask, T, kt, ct = _setup(seed=1, T0=1000.0, dT=500.0)
    codes = build_varprop_codes(mask)
    dt = jnp.float32(0.05)
    kw = dict(k_table=kt, cp_table=ct, dt=dt, theta=0.5, t_inf=20.0,
              emissivity=0.6, h_conv=12.0, interpret=True)
    Tb = T.astype(jnp.bfloat16)
    got = adi_step_varprop_gstreams(Tb, mask, grid, mat, **kw)
    assert got.dtype == jnp.bfloat16
    classic = adi_step_varprop_fused(Tb, mask, codes, grid, mat,
                                     gstreams=False, **kw)
    f32 = got.astype(jnp.float32)
    ulp = jnp.maximum(jnp.abs(f32) * 2.0 ** -8, 1e-3)
    assert float(jnp.max(jnp.abs(f32 - classic.astype(jnp.float32))
                         / ulp)) < 4.0
    with pytest.raises(NotImplementedError, match="stochastic"):
        adi_step_varprop_gstreams(Tb, mask, grid, mat, rng_seed=7, **kw)


def test_gstream_fields_match_xla_build():
    """gstream_fields' nine streams equal the XLA formulation assembled
    from build_varprop_fields + shifts, including the pre-scaled source."""
    from adi_thermal_fields_tpu.bc.faces import shift_in
    from adi_thermal_fields_tpu.solvers.pallas_gstreams import \
        gstream_fields
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        _table_spec, build_varprop_fields)

    grid, mat, mask, T, kt, ct = _setup(seed=2)
    rng = np.random.default_rng(5)
    src = jnp.asarray(1e6 * rng.random(T.shape), jnp.float32)
    dt = jnp.float32(0.05)
    theta = 0.5
    tg3 = jnp.stack([theta * dt / d ** 2 for d in grid.spacing])
    sk3 = jnp.stack([dt / d for d in grid.spacing])
    h = 140.0
    g_lo, g_hi, sw, src_pre = gstream_fields(
        T, mask.astype(jnp.int8), tg3, sk3, h, 20.0, 0.0, dt,
        src=src, k_spec=_table_spec(kt, mat.k),
        cp_spec=_table_spec(ct, mat.cp), rho=mat.rho, h_mode="const",
        interpret=True)
    fc, w = build_varprop_fields(T, mask, mat, kt, ct)
    for ax in range(3):
        lo_want = tg3[ax] * w * fc[ax]
        hi_want = tg3[ax] * w * shift_in(fc[ax], ax, +1, fill=0.0)
        np.testing.assert_allclose(np.asarray(g_lo[ax]),
                                   np.asarray(lo_want), rtol=2e-6,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(g_hi[ax]),
                                   np.asarray(hi_want), rtol=2e-6,
                                   atol=1e-12)
        cpl_lo = (mask & shift_in(mask, ax, -1, fill=False))
        cpl_hi = (mask & shift_in(mask, ax, +1, fill=False))
        nexp = (2.0 - cpl_lo.astype(jnp.float32)
                - cpl_hi.astype(jnp.float32)) * mask
        sw_want = sk3[ax] * h * w * nexp
        np.testing.assert_allclose(np.asarray(sw[ax]),
                                   np.asarray(sw_want), rtol=2e-6,
                                   atol=1e-12)
    np.testing.assert_allclose(np.asarray(src_pre),
                               np.asarray(dt * w * mask * src),
                               rtol=2e-6, atol=1e-12)
