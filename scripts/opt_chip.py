"""Chip smoke for the adjoint optimizer (apps/optimize_process.py).

Runs a tiny f32 inverse-design problem on the real TPU: gradients must be
finite and two Adam iterations must reduce the loss.  The full numeric
gates (FD parity etc.) run in the CPU/x64 suite; this validates that the
adjoint of the scan-path ADI step compiles and descends on hardware at f32.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from adi_thermal_fields_tpu.apps.optimize_process import (
    build_wall_problem, make_forward, optimize)
from adi_thermal_fields_tpu.core.material import Material


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    print("devices:", jax.devices())
    mat = Material(7800.0, 490.0, 30.0)
    dtype = jnp.float32
    grid, masks, newborn, probe_w = build_wall_problem(
        nx=32, ny=16, nz_plate=4, n_layers=args.layers, layer_vox=2,
        wall_w_vox=3, dx=1.5e-3, mat=mat, h=80.0, t_inf=25.0, dtype=dtype)
    forward = make_forward(grid, masks, newborn, probe_w, mat, h=80.0,
                           t_inf=25.0, n_sub=16, target_t85=4.0, dtype=dtype)
    L = args.layers
    dep0 = jnp.full((L,), 1550.0, dtype)
    dw0 = jnp.full((L,), 6.0, dtype)

    t0 = time.perf_counter()
    loss0, aux0 = forward(dep0, dw0)
    loss0 = float(loss0)
    print(f"forward compile+run {time.perf_counter()-t0:.1f} s, "
          f"loss0 {loss0:.6g}, t85 {[f'{v:.3g}' for v in aux0['t85']]}")

    t0 = time.perf_counter()
    dep, dw, hist = optimize(forward, "deposit_T", dep0, dw0,
                             iters=args.iters, lr=20.0)
    print(f"optimize {time.perf_counter()-t0:.1f} s")
    loss1 = float(forward(dep, dw)[0])
    assert all(map(lambda x: x == x, hist)), "non-finite loss in history"
    assert loss1 < loss0, (loss0, loss1)
    print(f"OPT-CHIP-OK loss {loss0:.6g} -> {loss1:.6g} "
          f"({args.iters} iters, f32, single chip)")


if __name__ == "__main__":
    main()
