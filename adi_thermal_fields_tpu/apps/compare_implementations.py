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
    return p


def run(args) -> dict:
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


def main(argv=None):
    run(build_argparser().parse_args(argv))


if __name__ == "__main__":
    main()
