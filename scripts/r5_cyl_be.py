"""Diagnose the plain cylindrical BE step (VERDICT r4 weak #3): at
(128, 512, 512) it records 3.79 ms/step = 212 GB/s = 25.9% of HBM on a
24 B/cell model — slower in wall-clock than the masked variant doing
strictly more physics on the same cell count.  Speed-of-light on its own
model is ~1 ms; ~2.8 ms/step is unaccounted.

Run in a HEALTHY window (probe gate).  Three parts:
  1. slope-time the full BE step (the bench configuration);
  2. slope-time each leg STANDALONE (r sweep / cyclic phi / nat-z sweep)
     on the same shape to name the dominant leg;
  3. capture + parse a device trace of the jitted step (trace_512
     op_breakdown) for the XLA-inserted ops between the kernels.

Reference semantics: adi3d_cyl_phi_v3.py:332-373 (BE chain r->phi->z).
Usage: python scripts/r5_cyl_be.py [--shape 128 512 512] [--trace]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np


def slope3(loop, steps=40):
    k = max(1, steps // 4)
    loop(k)
    med = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop(k)
        t1 = time.perf_counter()
        loop(k + steps)
        t2 = time.perf_counter()
        med.append(((t2 - t1) - (t1 - t0)) / steps)
    return float(np.median(med)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(128, 512, 512))
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    import r4_gates as g
    if not g.probe() and not args.force:
        print("[r5 cyl be] DEGRADED window — aborting", flush=True)
        sys.exit(2)

    import functools

    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import (CylindricalGrid, Material, RobinBC,
                                        ZFaceBC)
    from adi_thermal_fields_tpu.step import cylindrical as cyl

    nr, nphi, nz = args.shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    robin = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)
    ncell = nr * nphi * nz
    probe_s = jax.jit(lambda x: jnp.sum(x[::32, ::64, ::64]))

    # ---- 1. full step (bench configuration) -------------------------------
    @jax.jit
    def step(T, dt):
        return cyl.adi_step(T, grid, mat, dt=dt, robin_outer=robin,
                            zbc=zbc, implementation="pallas")

    T0 = jnp.full(args.shape, 900.0, jnp.float32)
    dt = jnp.asarray(0.02, jnp.float32)
    T1 = step(T0, dt)
    float(probe_s(T1))

    def full_loop(k, T=T1):
        for _ in range(k):
            T = step(T, dt)
        float(probe_s(T))

    ms = slope3(full_loop)
    print(f"[cyl be full {args.shape}] {ms:.2f} ms/step = "
          f"{ncell/ms/1e6:.2f} Gcell/s", flush=True)

    # ---- 2. per-leg standalone --------------------------------------------
    legs = {
        "r": jax.jit(lambda X: cyl._r_sweep(X, grid, mat, dt, robin, None,
                                            implementation="pallas")),
        "phi": jax.jit(lambda X: cyl._phi_solve(X, grid, mat, 1.0, dt,
                                                "pallas")),
        "z": jax.jit(lambda X: cyl._z_sweep(X, grid, mat, dt, zbc,
                                            implementation="pallas")),
    }
    for name, fn in legs.items():
        X1 = fn(T1)
        float(probe_s(X1))

        def leg_loop(k, fn=fn, X=X1):
            for _ in range(k):
                X = fn(X)
            float(probe_s(X))

        lms = slope3(leg_loop)
        print(f"[cyl be leg {name}] {lms:.2f} ms, apparent "
              f"{ncell * 8 / lms / 1e6:.0f} GB/s on the 8 B/cell "
              f"rhs-in/x-out model", flush=True)

    # ---- 2b. candidate fixes, same-session A/B ----------------------------
    # phi: the natural-layout cyclic kernel (full-buffer dim-0/1 relayout)
    # vs the default transpose-pair path.  Parity on-chip, then slope A/B;
    # flip pallas_sweeps.PHI_NAT_DEFAULT on a win.
    from adi_thermal_fields_tpu.solvers import pallas_sweeps as ps
    from adi_thermal_fields_tpu.solvers.spectral import phi_eigenvalue_factors

    fac_r = (mat.alpha * dt * phi_eigenvalue_factors(grid, dtype=jnp.float32))
    fac = jnp.broadcast_to(fac_r[:, None], (nr, nz))
    phi_nat = jax.jit(lambda X: ps.fused_cyclic_const_nat(X, fac))
    phi_t2 = jax.jit(lambda X: jnp.transpose(
        ps.fused_cyclic_const(jnp.transpose(X, (1, 0, 2)), fac), (1, 0, 2)))
    Xa, Xb = phi_nat(T1), phi_t2(T1)
    err = float(jnp.max(jnp.abs(Xa - Xb)))
    print(f"[cyl be phi nat-vs-t2 parity] max |diff| = {err:.3e} K "
          f"({'PASS' if err < 1e-3 else 'FAIL'})", flush=True)
    phi_nat256 = jax.jit(lambda X: ps.fused_cyclic_const_nat(
        X, fac, block_b2=256))
    for name, fn in (("t2", phi_t2), ("nat", phi_nat),
                     ("nat-b2=256", phi_nat256)):
        try:
            X1 = fn(T1)
            float(probe_s(X1))
        except Exception as e:
            print(f"[cyl be phi {name}] FAILED: {type(e).__name__}",
                  flush=True)
            continue

        def leg_loop(k, fn=fn, X=X1):
            for _ in range(k):
                X = fn(X)
            float(probe_s(X))

        lms = slope3(leg_loop)
        print(f"[cyl be phi {name}] {lms:.2f} ms, apparent "
              f"{ncell * 8 / lms / 1e6:.0f} GB/s (8 B model)", flush=True)

    # step-level A/B with the nat phi routed (the flip decision number)
    ps.PHI_NAT_DEFAULT = True
    try:
        @jax.jit
        def step_nat(T, dt):
            return cyl.adi_step(T, grid, mat, dt=dt, robin_outer=robin,
                                zbc=zbc, implementation="pallas")

        Tn = step_nat(T1, dt)
        float(probe_s(Tn))

        def full_nat_loop(k, T=Tn):
            for _ in range(k):
                T = step_nat(T, dt)
            float(probe_s(T))

        msn = slope3(full_nat_loop)
        print(f"[cyl be full PHI_NAT {args.shape}] {msn:.2f} ms/step = "
              f"{ncell/msn/1e6:.2f} Gcell/s (vs t2 {ms:.2f})", flush=True)
    finally:
        ps.PHI_NAT_DEFAULT = False

    # r sweep: lane-tile sweep (the vp2 morning tune found b2=512 beating
    # 256 on the short-line r leg; the const tier defaults to 128).
    # Coefficients exactly as cyl._r_sweep builds them.
    ge_a, ge_c, ge_rob, rob_rhs = cyl._r_geometry(grid, mat, robin, None)
    facr = jnp.asarray(float(dt) * mat.alpha, jnp.float32)
    coef = (-facr * jnp.asarray(ge_a, jnp.float32),
            1.0 + facr * jnp.asarray(ge_a + ge_c + ge_rob, jnp.float32),
            -facr * jnp.asarray(ge_c, jnp.float32),
            facr * jnp.asarray(rob_rhs, jnp.float32))
    for b2 in (128, 256, 512):
        rfn = jax.jit(functools.partial(ps.fused_sweep_const, block_b2=b2))
        try:
            X1 = rfn(T1, *coef)
            float(probe_s(X1))
        except Exception as e:
            print(f"[cyl be r b2={b2}] FAILED: {type(e).__name__}", flush=True)
            continue

        def leg_loop(k, fn=rfn, X=X1):
            for _ in range(k):
                X = fn(X, *coef)
            float(probe_s(X))

        lms = slope3(leg_loop)
        print(f"[cyl be r b2={b2}] {lms:.2f} ms, apparent "
              f"{ncell * 8 / lms / 1e6:.0f} GB/s (8 B model)", flush=True)

    # ---- 3. device trace ---------------------------------------------------
    if args.trace:
        from adi_thermal_fields_tpu.io.profiling import trace
        from trace_512 import op_breakdown

        logdir = "/tmp/trace_cyl_be"
        with trace(logdir):
            T = T1
            for _ in range(6):
                T = step(T, dt)
            float(probe_s(T))
        op_breakdown(logdir)


if __name__ == "__main__":
    main()
