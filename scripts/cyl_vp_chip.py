"""Chip gate for the compressed cylindrical-varprop kernels
(solvers/pallas_vpfields.py).

Round-3 Mosaic rule (NOTES.md): no new kernel is done until it COMPILES on
real hardware — sub-tile DMA hazards are invisible in interpret mode.
Run on the real chip:

  1. compile-check fused_vp_fields_sweep + fused_vp_fields_cyclic_axis1
     (f32 and bf16 state);
  2. on-chip parity of adi_step_cyl_varprop: 'pallas' (compressed) vs
     'pallas_fields' (materialized) vs 'xla' at a small shape
     (FMA-contraction-level agreement expected, rtol ~1e-5);
  3. slope A/B of the full step, compressed vs materialized, at the bench
     shape (64, 512, 256) — the number for BASELINE.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def slope(fn, steps=16):
    import jax

    k_small = max(1, steps // 4)

    def loop(k):
        r = None
        for _ in range(k):
            r = fn(r)
        return float(jax.numpy.asarray(r).ravel()[0])

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
    ap.add_argument("--shape", type=int, nargs=3, default=(64, 512, 256))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adi_thermal_fields_tpu import (CylindricalGrid, Material, RobinBC,
                                        ZFaceBC)
    from adi_thermal_fields_tpu.solvers.pallas_vpfields import (
        fused_vp_fields_cyclic_axis1, fused_vp_fields_sweep)
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        apparent_cp, melt_pool_enhanced_k)
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    print("devices:", jax.devices(), flush=True)

    # --- 1. compile gates -------------------------------------------------
    # Raw kernels take f32/f64 streams only (sub-f32 states are upcast by
    # adi_step_cyl_varprop before they reach the kernels) — so the raw-kernel
    # compile gate runs at f32; the bf16 path is gated through the step API
    # in part 2 below.
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32,):
        n, b1, b2 = 64, 16, 256
        rhs = jnp.asarray(rng.random((n, b1, b2)), dtype)
        fhi = jnp.asarray(40 * rng.random((n, b1, b2)), dtype)
        dw = jnp.asarray(1e-3 * rng.random((n, b1, b2)), dtype)
        sink = jnp.zeros((n, b1, b2), dtype)
        glo = jnp.asarray(1 + rng.random(n), dtype)
        t0 = time.perf_counter()
        out = jax.jit(lambda *a: fused_vp_fields_sweep(*a, glo, glo))(
            rhs, fhi, dw, sink, sink)
        print(f"open kernel {dtype.__name__}: compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s sum={float(out.sum()):.3f}",
              flush=True)
        rhs2 = jnp.asarray(rng.random((b1, n, b2)), dtype)
        flo2 = jnp.asarray(40 * rng.random((b1, n, b2)), dtype)
        geo = jnp.asarray(rng.random((b1, b2)), dtype)
        t0 = time.perf_counter()
        out2 = jax.jit(lambda d, lo: fused_vp_fields_cyclic_axis1(
            d, lo, jnp.roll(lo, -1, 1), jnp.full_like(d, 1e-3),
            jnp.zeros_like(d), jnp.zeros_like(d), geo))(rhs2, flo2)
        print(f"cyclic kernel {dtype.__name__}: compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s sum={float(out2.sum()):.3f}",
              flush=True)

    # --- 2. on-chip step parity --------------------------------------------
    grid = CylindricalGrid(16, 64, 32, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    rob = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    act = jnp.ones(grid.shape, bool).at[:, :, 24:].set(False)
    T0 = jnp.where(act, 1600.0, 20.0).astype(jnp.float32)
    kw = dict(dt=jnp.float32(0.02), robin_outer=rob, zbc=zbc, k_table=kt,
              cp_table=ct, robin_inner=RobinBC(50.0, 20.0), active=act,
              h_void=80.0, T_inf_void=20.0, h_front=200.0, emissivity=0.5)
    outs = {}
    for impl in ("pallas", "pallas_fields", "xla"):
        f = jax.jit(lambda T, impl=impl: adi_step_cyl_varprop(
            T, grid, mat, implementation=impl, **kw))
        outs[impl] = np.asarray(f(T0))
    e1 = np.abs(outs["pallas"] - outs["xla"]).max()
    e2 = np.abs(outs["pallas_fields"] - outs["xla"]).max()
    print(f"parity: compressed-vs-xla {e1:.3e}, "
          f"materialized-vs-xla {e2:.3e}", flush=True)
    assert e1 < 2e-3 and e2 < 2e-3, (e1, e2)

    # bf16-state gate: the step upcasts sub-f32 streams to f32 internally
    # (single downcast at the store) — compile + parity vs the f32 state.
    Tb = jax.jit(lambda T: adi_step_cyl_varprop(
        T, grid, mat, implementation="pallas", **kw))(T0.astype(jnp.bfloat16))
    eb = np.abs(np.asarray(Tb, np.float32) - outs["pallas"]).max()
    rel = eb / max(1.0, np.abs(outs["pallas"]).max())
    print(f"bf16-state parity vs f32 (compressed): maxdiff={eb:.3e} "
          f"(rel {rel:.2e})", flush=True)
    assert rel < 2e-2, eb

    # --- 3. slope A/B at the bench shape ------------------------------------
    nr, nphi, nz = args.shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    a = np.zeros(grid.shape, bool)
    a[:, :, :nz // 2] = True
    a[:, :(3 * nphi) // 5, nz // 2:nz // 2 + nz // 8] = True
    act = jnp.asarray(a)
    T0 = jnp.where(act, 1600.0, 20.0).astype(jnp.float32)
    kw["active"] = act
    for impl in ("pallas", "pallas_fields"):
        step = jax.jit(lambda T, impl=impl: adi_step_cyl_varprop(
            T, grid, mat, implementation=impl, **kw))

        def fn(T, step=step, T0=T0):
            return step(T0 if T is None else T)

        el = slope(fn)
        gc = grid.nr * grid.nphi * grid.nz / el / 1e9
        print(f"{impl:14s} {args.shape}: {el * 1e3:.2f} ms/step "
              f"= {gc:.2f} Gcell/s", flush=True)
    print("CYL-VP GATE PASS")


if __name__ == "__main__":
    main()
