"""Implementation A/B driver: fused Pallas path vs XLA scan path (CLI app).

The analogue of the reference's CPU-vs-GPU backend comparison
(quick_compare_neumann_robin_backend.py:172-231): runs the identical
Neumann-heated / Robin-cooled cylinder on both execution paths, reports
wall-clock per step and the RMS / max field difference at the end.

    python -m adi_thermal_fields_tpu.apps.compare_implementations --n 128
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="XLA vs Pallas ADI step comparison")
    p.add_argument("--n", type=int, default=128, help="grid edge (n^3)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dt", type=float, default=0.05)
    p.add_argument("--precision", choices=["float32", "float64"],
                   default="float32")
    p.add_argument("--case", choices=["cartesian", "cyl_varprop"],
                   default="cartesian",
                   help="cartesian: theta-step XLA-vs-Pallas (the "
                        "reference backend A/B); cyl_varprop: the "
                        "variable-property cylindrical step's three tiers "
                        "(xla scan / materialized field kernels / "
                        "compressed stream kernels)")
    return p


def run(args) -> dict:
    if getattr(args, "case", "cartesian") == "cyl_varprop":
        return run_cyl_varprop(args)
    import jax
    import jax.numpy as jnp

    from ..core.grid import CartesianGrid
    from ..core.material import Material
    from ..bc.packs import build_coeff_packs
    from ..geometry.shapes import cylinder_mask
    from ..io.logging import log
    from ..step.cartesian import adi_step
    from ..step.cartesian_pallas import adi_step_pallas, build_sweep_plan

    n = args.n
    dtype = jnp.float32 if args.precision == "float32" else jnp.float64
    grid = CartesianGrid(n, n, n, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    mask = jnp.asarray(cylinder_mask(n, n, n, grid.dx, 0.45 * n * grid.dx))
    packs = build_coeff_packs(mask, grid, mat, robin_h=300.0,
                              neumann={"z-": 2e5}, dtype=dtype)
    T0 = jnp.full(grid.shape, 20.0, dtype)
    dt = jnp.asarray(args.dt, dtype)

    interpret = jax.default_backend() == "cpu"
    plan = jax.jit(lambda m, p: build_sweep_plan(m, p, has_neumann=True,
                                                 has_dirichlet=False))(mask, packs)
    paths = {
        "xla": jax.jit(lambda T, dt: adi_step(T, mask, packs, grid, mat,
                                              dt=dt, theta=0.5, t_inf=20.0)),
        "pallas": jax.jit(lambda T, dt: adi_step_pallas(
            T, plan, grid, mat, dt=dt, theta=0.5, t_inf=20.0,
            interpret=interpret)),
    }
    probe = jax.jit(lambda x: jnp.sum(x[:: max(1, n // 8)]))

    results, timings = {}, {}
    for name, step in paths.items():
        T = step(T0, dt)
        float(probe(T))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.steps):
            T = step(T, dt)
        float(probe(T))
        el = (time.perf_counter() - t0) / args.steps
        timings[name] = el
        results[name] = np.asarray(T)
        log(f"{name:7s}: {el * 1e3:8.2f} ms/step  "
            f"({grid.ncells / el / 1e9:6.2f} Gcell/s)", tag="time")

    diff = results["xla"] - results["pallas"]
    m = np.asarray(mask)
    rms = float(np.sqrt(np.mean(diff[m] ** 2)))
    mx = float(np.abs(diff[m]).max())
    log(f"xla vs pallas: RMS={rms:.3e}  max={mx:.3e}", tag="diff")
    return {"timings": timings, "rms": rms, "max": mx}


def run_cyl_varprop(args) -> dict:
    """Three-tier A/B of the variable-property cylindrical step on a
    part-deposited annulus (latent heat + melt-pool k + radiation):
    'xla' scan vs 'pallas_fields' (materialized a/b/c/d) vs 'pallas'
    (compressed stream kernels, solvers/pallas_vpfields.py)."""
    import jax
    import jax.numpy as jnp

    from ..core.grid import CylindricalGrid
    from ..core.material import Material
    from ..io.logging import log
    from ..step.cartesian_varprop import apparent_cp, melt_pool_enhanced_k
    from ..step.cylindrical import RobinBC, ZFaceBC
    from ..step.cylindrical_varprop import adi_step_cyl_varprop

    n = args.n
    dtype = jnp.float32 if args.precision == "float32" else jnp.float64
    nr, nphi, nz = max(8, n // 8), 4 * n, n
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    act = np.zeros(grid.shape, bool)
    act[:, :, :nz // 2] = True
    act[:, :(3 * nphi) // 5, nz // 2:nz // 2 + max(1, nz // 8)] = True
    active = jnp.asarray(act)
    T0 = jnp.where(active, 1600.0, 20.0).astype(dtype)
    dt = jnp.asarray(args.dt, dtype)
    interpret = jax.default_backend() == "cpu"
    kw = dict(robin_outer=RobinBC(300.0, 20.0),
              zbc=ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0),
              robin_inner=RobinBC(50.0, 20.0), k_table=kt, cp_table=ct,
              h_void=80.0, T_inf_void=20.0, h_front=200.0, emissivity=0.5)
    paths = {
        impl: jax.jit(lambda T, dt, impl=impl: adi_step_cyl_varprop(
            T, grid, mat, dt=dt, active=active, implementation=impl,
            interpret=interpret, **kw))
        for impl in ("xla", "pallas_fields", "pallas")
    }
    probe = jax.jit(lambda x: jnp.sum(x[::8, ::64, ::32]))

    results, timings = {}, {}
    for name, step in paths.items():
        T = step(T0, dt)
        float(probe(T))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            T = step(T, dt)
        float(probe(T))
        el = (time.perf_counter() - t0) / args.steps
        timings[name] = el
        results[name] = np.asarray(T)
        log(f"{name:14s}: {el * 1e3:8.2f} ms/step  "
            f"({grid.nr * grid.nphi * grid.nz / el / 1e9:6.2f} Gcell/s)",
            tag="time")

    m = np.asarray(active)
    out = {"timings": timings}
    for a, b in (("xla", "pallas_fields"), ("xla", "pallas")):
        diff = (results[a] - results[b])[m]
        rms = float(np.sqrt(np.mean(diff ** 2)))
        mx = float(np.abs(diff).max())
        log(f"{a} vs {b}: RMS={rms:.3e}  max={mx:.3e}", tag="diff")
        out[f"max_{b}"] = mx
    return out


def main(argv=None):
    run(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
