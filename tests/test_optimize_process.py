"""Adjoint process-optimization gates (apps/optimize_process.py).

Validates the beyond-reference inverse-design capability: (1) the adjoint
gradient through the full multi-layer ADI build matches central finite
differences, (2) a few Adam iterations actually reduce the t8/5-uniformity
loss and tighten the per-layer t8/5 spread, (3) the CLI runs end-to-end.
The reference framework cannot do any of this (Numba/CuPy cores are not
differentiable).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adi_thermal_fields_tpu.apps.optimize_process import (
    build_argparser, build_wall_problem, make_forward, optimize, run)
from adi_thermal_fields_tpu.core.material import Material

# heavy tier (adjoint schedule optimizations): excluded from scripts/test.sh --smoke
pytestmark = pytest.mark.full


def _tiny_problem(n_layers=3, target=2.0):
    mat = Material(7800.0, 490.0, 30.0)
    dtype = jnp.float64
    grid, masks, newborn, probe_w = build_wall_problem(
        nx=10, ny=6, nz_plate=3, n_layers=n_layers, layer_vox=1,
        wall_w_vox=2, dx=2e-3, mat=mat, h=200.0, t_inf=25.0, dtype=dtype)
    forward = make_forward(grid, masks, newborn, probe_w, mat, h=200.0,
                           t_inf=25.0, n_sub=8, target_t85=target,
                           dtype=dtype)
    L = n_layers
    dep0 = jnp.full((L,), 1500.0, dtype)
    dw0 = jnp.full((L,), 3.0, dtype)
    return forward, dep0, dw0


def test_adjoint_gradient_matches_finite_differences():
    forward, dep0, dw0 = _tiny_problem()

    def loss_dep(p):
        return forward(p, dw0)[0]

    def loss_dw(p):
        return forward(dep0, p)[0]

    for loss_fn, x0, eps in ((loss_dep, dep0, 1e-2), (loss_dw, dw0, 1e-5)):
        g = jax.grad(loss_fn)(x0)
        assert bool(jnp.all(jnp.isfinite(g)))
        for i in (0, len(x0) - 1):
            e = jnp.zeros_like(x0).at[i].set(eps)
            fd = (loss_fn(x0 + e) - loss_fn(x0 - e)) / (2 * eps)
            ref = max(abs(float(fd)), 1e-9)
            assert abs(float(g[i]) - float(fd)) / ref < 5e-4, (
                f"coord {i}: adjoint {float(g[i])} vs FD {float(fd)}")


def test_optimization_reduces_loss_and_spread():
    forward, dep0, dw0 = _tiny_problem(n_layers=4, target=1.5)
    loss0, aux0 = forward(dep0, dw0)
    dep, dw, hist = optimize(forward, "deposit_T", dep0, dw0, iters=40,
                             lr=15.0, log=None)
    loss1, aux1 = forward(dep, dw)
    # first-crossing t8/5 has a physical floor (layer 0 on the cold plate
    # quenches fast no matter the deposit temperature), so the residual
    # target miss cannot go to zero; the converged ratio is ~0.67
    assert float(loss1) < 0.75 * float(loss0), (float(loss0), float(loss1))
    spread0 = float(jnp.max(aux0["t85"]) - jnp.min(aux0["t85"]))
    spread1 = float(jnp.max(aux1["t85"]) - jnp.min(aux1["t85"]))
    # equalizing t8/5 across layers is the point of the exercise
    assert spread1 < spread0
    # monotone-ish descent: final entry below the first
    assert hist[-1] < hist[0]


def test_dwell_mode_stays_positive_and_descends():
    forward, dep0, dw0 = _tiny_problem(n_layers=3, target=1.0)
    loss0, _ = forward(dep0, dw0)
    dep, dw, hist = optimize(forward, "dwell", dep0, dw0, iters=15,
                             lr=0.3, log=None)
    loss1, _ = forward(dep, dw)
    assert bool(jnp.all(dw > 0.0))
    assert float(loss1) < float(loss0)


def test_varprop_forward_differentiable():
    """Latent-heat (apparent-cp) forward: differs from constant-cp and its
    adjoint gradient still matches finite differences."""
    from adi_thermal_fields_tpu.step.cartesian_varprop import apparent_cp

    mat = Material(7800.0, 490.0, 30.0)
    dtype = jnp.float64
    grid, masks, newborn, probe_w = build_wall_problem(
        nx=10, ny=6, nz_plate=3, n_layers=2, layer_vox=1,
        wall_w_vox=2, dx=2e-3, mat=mat, h=200.0, t_inf=25.0, dtype=dtype)
    kw = dict(h=200.0, t_inf=25.0, n_sub=12, target_t85=2.0, dtype=dtype)
    f_const = make_forward(grid, masks, newborn, probe_w, mat, **kw)
    # place the latent band (solidus..liquidus) inside the range the coarse
    # trajectory actually samples: an explicit-in-T apparent cp only acts on
    # steps whose STARTING temperature lies in the band, and the first
    # deposit step drops ~600 K — a 1420..1470 band would be stepped over
    f_vp = make_forward(grid, masks, newborn, probe_w, mat,
                        cp_table=apparent_cp(490.0, 490.0, 2.7e5,
                                             350.0, 650.0), **kw)
    dep0 = jnp.full((2,), 1550.0, dtype)
    dw0 = jnp.full((2,), 3.0, dtype)
    t85_c = f_const(dep0, dw0)[1]["t85"]
    t85_v = f_vp(dep0, dw0)[1]["t85"]
    # solidification heat above the band delays cooling into it
    assert not np.allclose(np.asarray(t85_c), np.asarray(t85_v))

    def loss(p):
        return f_vp(p, dw0)[0]

    g = jax.grad(loss)(dep0)
    eps = 1e-2
    e = jnp.zeros_like(dep0).at[0].set(eps)
    fd = (loss(dep0 + e) - loss(dep0 - e)) / (2 * eps)
    assert abs(float(g[0]) - float(fd)) / max(abs(float(fd)), 1e-9) < 1e-3


def test_t85_proxy_matches_hard_indicator():
    """With a narrow sigmoid width the smooth proxy must equal the
    dt-quantized hard-indicator replay of the same trajectory, in BOTH
    modes: 'occupancy' counts every step whose layer-mean lies in
    (500, 800); 'first_crossing' additionally stops each layer's clock at
    its first reading below 500 (reheat excursions don't count)."""
    from adi_thermal_fields_tpu.bc.packs import build_coeff_packs
    from adi_thermal_fields_tpu.step.cartesian import adi_step

    mat = Material(7800.0, 490.0, 30.0)
    dtype = jnp.float64
    grid, masks, newborn, probe_w = build_wall_problem(
        nx=10, ny=6, nz_plate=3, n_layers=2, layer_vox=1,
        wall_w_vox=2, dx=2e-3, mat=mat, h=200.0, t_inf=25.0, dtype=dtype)
    n_sub, dwell = 8, 3.0
    kw = dict(h=200.0, t_inf=25.0, n_sub=n_sub, target_t85=2.0,
              band_w=1e-3, dtype=dtype)
    dep0 = jnp.full((2,), 1550.0, dtype)
    dw0 = jnp.full((2,), dwell, dtype)
    t85_occ = np.asarray(make_forward(grid, masks, newborn, probe_w, mat,
                                      t85_mode="occupancy",
                                      **kw)(dep0, dw0)[1]["t85"])
    t85_fc = np.asarray(make_forward(grid, masks, newborn, probe_w, mat,
                                     t85_mode="first_crossing",
                                     **kw)(dep0, dw0)[1]["t85"])

    # replay the identical schedule with hard counting
    T = jnp.full(grid.shape, 25.0, dtype)
    hard_occ = np.zeros(2)
    hard_fc = np.zeros(2)
    done = np.zeros(2, bool)
    dt = dwell / n_sub
    for i in range(2):
        pk = build_coeff_packs(masks[i], grid, mat, robin_h=200.0,
                               dtype=dtype)
        T = jnp.where(newborn[i], 1550.0, T)
        for _ in range(n_sub):
            T = adi_step(T, masks[i], pk, grid, mat, dt=dt, theta=1.0,
                         t_inf=25.0)
            tm = np.asarray(probe_w @ T.reshape(-1))
            for j in range(i + 1):
                if 500.0 < tm[j] < 800.0:
                    hard_occ[j] += dt
                    if not done[j]:
                        hard_fc[j] += dt
                if tm[j] < 500.0:
                    done[j] = True
    np.testing.assert_allclose(t85_occ, hard_occ, atol=1e-6)
    np.testing.assert_allclose(t85_fc, hard_fc, atol=1e-6)
    # first-crossing never exceeds occupancy
    assert np.all(t85_fc <= t85_occ + 1e-12)


def test_dwell_reparameterization_stable_for_long_dwells():
    """Inverse softplus must not overflow for initial dwells above ~709 s
    (expm1 overflow); the optimizer must stay finite and descend."""
    forward, dep0, dw0 = _tiny_problem(n_layers=2, target=1.0)
    long_dw = jnp.full((2,), 800.0, jnp.float64)
    dep, dw, hist = optimize(forward, "dwell", dep0, long_dw, iters=3,
                             lr=0.3, log=None)
    assert np.isfinite(hist).all(), hist
    assert bool(jnp.all(jnp.isfinite(dw))) and bool(jnp.all(dw > 0))
    # round trip: softplus(inverse(x)) == x for large x
    assert abs(float(dw[0]) - 800.0) < 800.0  # moved finitely, not NaN


def test_sharded_adjoint_matches_single_device():
    """Pod-scale inverse design: the adjoint gradient computed with the
    problem fields sharded over the 8-device mesh must equal the
    single-device gradient (GSPMD partitions the forward AND the
    reverse-mode sweep; collectives are inserted automatically)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mat = Material(7800.0, 490.0, 30.0)
    dtype = jnp.float64
    # mesh-divisible extents: y=8 over 2 devices, z=8 over 4
    grid, masks, newborn, probe_w = build_wall_problem(
        nx=8, ny=8, nz_plate=4, n_layers=4, layer_vox=1,
        wall_w_vox=2, dx=2e-3, mat=mat, h=200.0, t_inf=25.0, dtype=dtype)
    kw = dict(h=200.0, t_inf=25.0, n_sub=8, target_t85=2.0, dtype=dtype)
    dep0 = jnp.full((4,), 1500.0, dtype)
    dw0 = jnp.full((4,), 3.0, dtype)
    f_ref = make_forward(grid, masks, newborn, probe_w, mat, **kw)
    g_ref = jax.grad(lambda p: f_ref(p, dw0)[0])(dep0)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("a", "b"))
    sh = NamedSharding(mesh, P(None, None, "a", "b"))   # (L, x, y, z)
    masks = jax.device_put(masks, sh)
    newborn = jax.device_put(newborn, sh)
    f_sh = make_forward(grid, masks, newborn, probe_w, mat, **kw)
    g_sh = jax.jit(jax.grad(lambda p: f_sh(p, dw0)[0]))(dep0)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-12, atol=1e-12)


def test_interpass_constrained_fastest_schedule():
    """--var dwell with an interpass limit and a time penalty: the optimizer
    must shorten the schedule while keeping every layer's interpass
    temperature at/below the limit (small tolerance for the soft penalty)."""
    mat = Material(7800.0, 490.0, 30.0)
    dtype = jnp.float64
    grid, masks, newborn, probe_w = build_wall_problem(
        nx=10, ny=6, nz_plate=3, n_layers=3, layer_vox=1,
        wall_w_vox=2, dx=2e-3, mat=mat, h=200.0, t_inf=25.0, dtype=dtype)
    forward = make_forward(grid, masks, newborn, probe_w, mat, h=200.0,
                           t_inf=25.0, n_sub=8, target_t85=2.0, dtype=dtype,
                           interpass_limit=250.0, interpass_penalty=1.0,
                           target_weight=0.0, time_penalty=0.05)
    dep0 = jnp.full((3,), 1500.0, dtype)
    # over-conservative start: far below the limit, lots of time to save
    dw0 = jnp.full((3,), 20.0, dtype)
    _, aux0 = forward(dep0, dw0)
    assert float(jnp.max(aux0["interpass"])) < 250.0 - 50.0

    dep, dw, hist = optimize(forward, "dwell", dep0, dw0, iters=60,
                             lr=0.25, log=None)
    _, aux1 = forward(dep, dw)
    # substantially faster than the conservative start...
    assert float(jnp.sum(dw)) < 0.7 * float(jnp.sum(dw0))
    # ...and still essentially respecting the (soft) limit on every
    # CONSTRAINED segment (the last one is exempt: no deposit follows it,
    # so the optimizer rightly spends no time cooling the finished part)
    assert float(jnp.max(aux1["interpass"][:-1])) <= 250.0 + 15.0
    assert hist[-1] < hist[0]


def test_cli_end_to_end(tmp_path):
    out = tmp_path / "sched.json"
    args = build_argparser().parse_args([
        "--nx", "10", "--ny", "6", "--nz_plate", "3", "--layers", "3",
        "--layer_vox", "1", "--wall_w_vox", "2", "--dx_mm", "2.0",
        "--n_sub", "6", "--iters", "6", "--target_t85", "2.0",
        "--out", str(out)])
    result = run(args)
    assert result["loss_final"] < result["loss_initial"]
    assert out.exists()
    import json
    sched = json.loads(out.read_text())
    assert len(sched["deposit_T"]) == 3
