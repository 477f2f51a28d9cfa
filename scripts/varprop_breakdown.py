"""Slope-time the variable-property step's components on the chip.

The fused varprop path (solvers/pallas_varprop.py) runs at ~1.3 Gcell/s vs
the const-coefficient kernels' ~10 — this script measures where the time
actually goes at 384^3 so optimization follows evidence, not the traffic
model (round-3 lesson: the masked kernels' "issue-bound plateau" was a
timing artifact).

Components timed independently (each jitted, slope-timed per
io/profiling.StepTimer):
    interp     face-conductivity fields + 1/(rho cp(T)) build in XLA
    rad_h      radiative film build (bc/radiation.radiative_h)
    stencil    varprop_theta_rhs plane-carry kernel
    sweep_x    fused_varprop_sweep (axis 0)
    sweep_y    fused_varprop_sweep_axis1 (natural layout)
    relay_z    the (x,y,z)->(z,x,y) transposes of rhs+k+w(+h) and back
    sweep_z    fused_varprop_sweep on the re-laid arrays
    full       adi_step_varprop_fused (the composed step)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def slope(fn, steps=12):
    import jax

    k_small = max(1, steps // 4)

    def loop(k):
        r = None
        for _ in range(k):
            r = fn()
        jax.block_until_ready(r)
        return float(jax.numpy.asarray(r).ravel()[0]) if r is not None else 0.0

    loop(k_small)
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop(k_small)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        loop(steps)
        tb = time.perf_counter() - t0
        vals.append((tb - ts) / (steps - k_small))
    return sorted(vals)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu.bc.radiation import radiative_h
    from adi_thermal_fields_tpu.solvers.pallas_varprop import (
        fused_varprop_sweep, fused_varprop_sweep_axis1, varprop_theta_rhs)
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        adi_step_varprop_fused, apparent_cp, build_varprop_codes,
        melt_pool_enhanced_k)
    from bench import build_case

    n = args.n
    grid, mat, T, mask, _ = build_case(n, jnp.float32, lite=True)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    codes = jax.jit(build_varprop_codes)(mask)
    dt = 0.02
    theta = 0.5
    inv_d2 = [1.0 / (d * d) for d in grid.spacing]

    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        build_varprop_fields)

    interp = jax.jit(lambda T: build_varprop_fields(T, mask, mat, kt, ct))
    fc, w = interp(T)
    radh = jax.jit(lambda T: radiative_h(T, 0.5, 20.0, h_conv=15.0))
    hf = radh(T)
    mask8 = mask.astype(jnp.int8)

    stencil = jax.jit(lambda fc, w, T: varprop_theta_rhs(
        T, fc[0], fc[1], fc[2], w, mask8, (1.0 - theta) * dt, inv_d2))
    R0 = stencil(fc, w, T)

    def mk_sweep(kernel, ax, code):
        tg = theta * dt * inv_d2[ax]
        sk = dt / grid.spacing[ax]
        return jax.jit(lambda r, k_, w_, h_: kernel(
            r, code, k_, w_, tg, sk, 20.0, h=h_))

    sw_x = mk_sweep(fused_varprop_sweep, 0, codes[0])
    sw_y = mk_sweep(fused_varprop_sweep_axis1, 1, codes[1])
    sw_z = mk_sweep(fused_varprop_sweep, 2, codes[2])
    t2n = jax.jit(lambda V, k_, w_, h_: tuple(
        jnp.transpose(x, (2, 0, 1)) for x in (V, k_, w_, h_)))
    tback = jax.jit(lambda W: jnp.transpose(W, (1, 2, 0)))
    U = sw_x(R0, fc[0], w, hf)
    V = sw_y(U, fc[1], w, hf)
    Vz, fcz, wz, hz = t2n(V, fc[2], w, hf)
    W = sw_z(Vz, fcz, wz, hz)

    # the bench/engine configuration: SELF-radiative (emissivity given, no
    # caller h_field) — required for the vp2-z tier's eligibility
    full = jax.jit(lambda T: adi_step_varprop_fused(
        T, mask, codes, grid, mat, k_table=kt, cp_table=ct, dt=dt,
        theta=theta, t_inf=20.0, emissivity=0.5, h_conv=15.0))
    full(T)

    # The CURRENT flagship legs (round 5): ring theta+x, y axis-1, vp2-z
    # nat — the self-radiative engine configuration (bench --case varprop).
    from adi_thermal_fields_tpu.solvers.pallas_varprop import (
        fused_varprop_theta_sweep)
    from adi_thermal_fields_tpu.solvers.pallas_vp2 import (build_vp2_code,
                                                           fused_vp2_sweep)
    from adi_thermal_fields_tpu.step.cartesian_varprop import _table_spec

    tgx = theta * dt * inv_d2[0]
    skx = dt / grid.spacing[0]
    ring = jax.jit(lambda T, fc, w, h_: fused_varprop_theta_sweep(
        T, codes[0], fc[0], fc[1], fc[2], w, (1.0 - theta) * dt,
        [float(v) for v in inv_d2], tgx, skx, 20.0, h=h_))
    Ur = ring(T, fc, w, hf)

    kz_spec = _table_spec(kt, mat.k)
    cp_spec = _table_spec(ct, mat.cp)
    code_z2 = jax.jit(lambda m: jnp.moveaxis(
        build_vp2_code(m, 2, edge_exposed=True), 2, 0))(mask)
    nz = T.shape[2]
    glo = jnp.full((nz,), theta * inv_d2[2], jnp.float32)
    gs = jnp.full((nz,), 1.0 / grid.spacing[2], jnp.float32)
    dtor = jnp.asarray(dt / mat.rho, jnp.float32)
    vp2z = jax.jit(lambda V, T: fused_vp2_sweep(
        V, T, code_z2, glo, glo, gs, gs, dtor, k_spec=kz_spec,
        cp_spec=cp_spec, h_lo=15.0, h_hi=15.0, tinf_void=20.0,
        emissivity=0.5, nat_rhs_out=True))
    vp2z(V, T)

    comps = [
        ("interp", lambda: interp(T)[0][0]),
        ("rad_h", lambda: radh(T)),
        ("stencil", lambda: stencil(fc, w, T)),
        ("ring_tx", lambda: ring(T, fc, w, hf)),
        ("sweep_x", lambda: sw_x(R0, fc[0], w, hf)),
        ("sweep_y", lambda: sw_y(U, fc[1], w, hf)),
        ("vp2_z", lambda: vp2z(V, T)),
        ("relay_z", lambda: t2n(V, fc[2], w, hf)[0]),
        ("sweep_z", lambda: sw_z(Vz, fcz, wz, hz)),
        ("relay_back", lambda: tback(W)),
        ("full", lambda: full(T)),
    ]
    ncell = n ** 3
    print(f"[varprop breakdown] {n}^3 f32, radiative film, slope median-of-3")
    cur_path = {"interp", "rad_h", "ring_tx", "sweep_y", "vp2_z"}
    tot = 0.0
    for name, fn in comps:
        el = slope(fn)
        if name in cur_path:
            tot += el
        print(f"  {name:10s} {el * 1e3:8.2f} ms   "
              f"{ncell / el / 1e9:6.2f} Gcell/s-equiv")
    print(f"  {'sum':10s} {tot * 1e3:8.2f} ms (current-path legs "
          f"interp+rad_h+ring+y+vp2z vs full — overlap delta)")


if __name__ == "__main__":
    main()
