"""Benchmark harness: Cartesian masked ADI step throughput on one chip.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: ADI cell-updates/sec/chip at the largest grid that fits (target 512^3,
float32), on a realistic masked WAAM configuration (solid plate + deposited
block, Robin on all faces — the WAAM flagship BC set).

vs_baseline: fraction of the HBM-bandwidth "speed of light" for this
algorithm (the reference publishes no numbers — BASELINE.md — so the roofline
is the recorded baseline protocol).  Traffic model for a perfectly fused
step, per cell: explicit pass reads T(4B)+mask(1B) and writes R0(4B) = 9B;
each of the 3 sweeps reads rhs(4B)+mask(1B)+robin coeff(4B) and writes its
output(4B) = 13B; total 48 B/cell/step.  v5e HBM ~819 GB/s => SOL ~17.1e9
cell-updates/s.  vs_baseline > 1 is impossible; higher is better.
"""
import json
import sys
import time

import numpy as np

HBM_BYTES_PER_S = 819e9      # TPU v5e per-chip HBM bandwidth
TRAFFIC_B_PER_CELL = 48.0    # see module docstring
SOL_CELLS_PER_S = HBM_BYTES_PER_S / TRAFFIC_B_PER_CELL


def build_case(n, dtype, lite=False):
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import (CartesianGrid, Material,
                                        build_coeff_packs)

    grid = CartesianGrid(n, n, n, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    zsplit = (3 * n) // 4
    mask_np = np.ones(grid.shape, bool)
    mask_np[:, :, zsplit:] = False
    mask_np[n // 4: 3 * n // 4, n // 4: 3 * n // 4, zsplit: zsplit + n // 8] = True
    mask = jnp.asarray(mask_np)
    T = jnp.where(mask, 900.0, 20.0).astype(dtype)
    # Robin-only BCs: the flagship WAAM configuration (the reference's WAAM
    # driver applies convective h on all faces and nothing else,
    # waam_from_stl_v7_mm.py:446-455).  The plan-lite path derives the Robin
    # sink in-kernel, so it needs no coefficient packs at all — skipping them
    # frees ~28 B/cell of HBM and lifts the single-chip capacity ceiling
    # (640^3 fits lite but OOMs with packs resident).
    packs = (None if lite else
             build_coeff_packs(mask, grid, mat, robin_h=200.0, dtype=dtype))
    return grid, mat, T, mask, packs


def run(n, steps=20, dtype=None, implementation="pallas"):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    from adi_thermal_fields_tpu import adi_step_cartesian
    from adi_thermal_fields_tpu.step.cartesian_pallas import (adi_step_pallas,
                                                              build_sweep_plan)

    grid, mat, T, mask, packs = build_case(n, dtype,
                                           lite=implementation == "pallas")

    if implementation == "pallas":
        from adi_thermal_fields_tpu.step.cartesian_pallas import pad_domain

        # plan-lite: scalar-h Robin (the flagship WAAM BC set) derives the
        # per-axis sink in-kernel from the sweep code — no coeff fields.
        # pad_to_tile keeps the whole domain at kernel-tile-friendly dims
        # (no-op at 512^3; 2x at 576^3 where per-call pads dominate)
        rob_c = 200.0 / (mat.rho * mat.cp * grid.dx)
        plan = jax.jit(lambda m: build_sweep_plan(
            m, None, has_neumann=False, has_dirichlet=False,
            robin_const=rob_c, pad_to_tile=True))(mask)
        T = jax.jit(pad_domain)(T)  # once; the state then stays padded

        @jax.jit
        def step(T, plan, packs, dt):
            return adi_step_pallas(T, plan, grid, mat, dt=dt, theta=0.5,
                                   t_inf=20.0)

        mask = plan  # positional reuse below
    else:
        @jax.jit
        def step(T, mask, packs, dt):
            return adi_step_cartesian(T, mask, packs, grid, mat, dt=dt,
                                      theta=0.5, t_inf=20.0)

    # NOTE: on the remote-tunnel (axon) platform block_until_ready() can
    # return before execution completes; pulling a scalar that depends on the
    # whole step chain is the reliable synchronization.
    probe = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]))

    dt = jnp.asarray(0.05, dtype)
    T = step(T, mask, packs, dt)
    float(probe(T))  # compile + warm-up both programs
    t0 = time.perf_counter()
    for _ in range(steps):
        T = step(T, mask, packs, dt)
    float(probe(T))
    el = (time.perf_counter() - t0) / steps
    assert bool(jnp.isfinite(T).all()), "non-finite field in benchmark run"
    return grid.ncells / el, el


def run_cylindrical(shape=(128, 512, 512), steps=20, dtype=None):
    """Cylindrical BE step throughput (pallas r/z sweeps + cyclic phi)."""
    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import CylindricalGrid, Material, RobinBC, ZFaceBC
    from adi_thermal_fields_tpu.step.cylindrical import adi_step

    dtype = dtype or jnp.float32
    nr, nphi, nz = shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    robin = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)

    @jax.jit
    def step(T, dt):
        return adi_step(T, grid, mat, dt=dt, robin_outer=robin, zbc=zbc,
                        implementation="pallas")

    probe = jax.jit(lambda x: jnp.sum(x[::32, ::64, ::64]))
    T = jnp.full(shape, 900.0, dtype)
    dt = jnp.asarray(0.02, dtype)
    T = step(T, dt)
    float(probe(T))
    t0 = time.perf_counter()
    for _ in range(steps):
        T = step(T, dt)
    float(probe(T))
    el = (time.perf_counter() - t0) / steps
    assert bool(jnp.isfinite(T).all())
    ncells = nr * nphi * nz
    return ncells / el, el


def main_cylindrical():
    # cylindrical-step traffic model: r/z fused const-coeff sweeps are
    # 8 B/cell each (read rhs + write x), the cyclic phi solve 8 B/cell +
    # fac read ~0: ~24 B/cell/step
    sol = HBM_BYTES_PER_S / 24.0
    value = None
    for shape in ((128, 512, 512), (64, 256, 256)):
        for attempt in range(3):
            try:
                value, per_step = run_cylindrical(shape)
                print(f"[bench] cyl {shape}: {per_step * 1e3:.2f} ms/step -> "
                      f"{value / 1e9:.3f} Gcell/s", file=sys.stderr)
                break
            except Exception as e:
                print(f"[bench] cyl {shape} attempt {attempt}: "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                value = None
        if value is not None:
            break
    print(json.dumps({
        "metric": f"cyl_adi_cell_updates_per_s_per_chip_{shape}_f32",
        "value": value or 0.0,
        "unit": "cell/s",
        "vs_baseline": (value or 0.0) / sol,
    }))


def main_bf16():
    """bf16-state / f32-solve bandwidth mode (opt-in; ~24 B/cell/step)."""
    import jax.numpy as jnp

    sol = HBM_BYTES_PER_S / 24.0
    value = None
    for n in (512, 384, 256):
        for attempt in range(3):
            try:
                value, per_step = run(n, dtype=jnp.bfloat16)
                print(f"[bench] bf16 {n}^3: {per_step * 1e3:.2f} ms/step -> "
                      f"{value / 1e9:.3f} Gcell/s", file=sys.stderr)
                break
            except Exception as e:
                print(f"[bench] bf16 {n}^3 attempt {attempt}: "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                value = None
        if value is not None:
            break
    print(json.dumps({
        "metric": f"adi_cell_updates_per_s_per_chip_{n}^3_bf16",
        "value": value or 0.0,
        "unit": "cell/s",
        "vs_baseline": (value or 0.0) / sol,
    }))


def run_masked_cylindrical(shape=(64, 512, 256), steps=10, dtype=None):
    """Masked-Robin cylindrical step (element birth; field-coefficient
    fused kernels) on a part-deposited geometry."""
    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import (CylindricalGrid, Material, RobinBC,
                                        ZFaceBC)
    from adi_thermal_fields_tpu.step.cylindrical_masked import (
        adi_step_masked_robin)

    dtype = dtype or jnp.float32
    nr, nphi, nz = shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    rob = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)
    act = np.zeros(shape, bool)
    act[:, :, :nz // 2] = True
    act[:, :(3 * nphi) // 5, nz // 2:nz // 2 + nz // 8] = True
    active = jnp.asarray(act)

    @jax.jit
    def step(T, a, dt):
        return adi_step_masked_robin(T, grid, mat, dt=dt, active=a,
                                     robin_outer=rob, zbc=zbc, robin_inner=rob,
                                     h_void=80.0, implementation="pallas")

    probe = jax.jit(lambda x: jnp.sum(x[::16, ::64, ::64]))
    T = jnp.where(active, 900.0, 20.0).astype(dtype)
    dt = jnp.asarray(0.02, dtype)
    T = step(T, active, dt)
    float(probe(T))
    t0 = time.perf_counter()
    for _ in range(steps):
        T = step(T, active, dt)
    float(probe(T))
    el = (time.perf_counter() - t0) / steps
    assert bool(jnp.isfinite(T).all())
    return nr * nphi * nz / el, el


def main_masked():
    # traffic model (compressed masked kernels): per sweep a prefold pass
    # (read rhs + sink_rhs + masks, write d ~ 14 B) + the kernel
    # (read d + code + sink, write x = 13 B); phi/z add a layout-change
    # pair (16 B).  3 sweeps + final select ~ 120 B/cell/step.
    sol = HBM_BYTES_PER_S / 120.0
    value = None
    for shape in ((64, 512, 256), (32, 256, 128)):
        for attempt in range(3):
            try:
                value, per_step = run_masked_cylindrical(shape)
                print(f"[bench] masked-cyl {shape}: {per_step * 1e3:.2f} "
                      f"ms/step -> {value / 1e9:.3f} Gcell/s", file=sys.stderr)
                break
            except Exception as e:
                print(f"[bench] masked-cyl {shape} attempt {attempt}: "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                value = None
        if value is not None:
            break
    print(json.dumps({
        "metric": f"masked_cyl_cell_updates_per_s_per_chip_{shape}_f32",
        "value": value or 0.0,
        "unit": "cell/s",
        "vs_baseline": (value or 0.0) / sol,
    }))


def main():
    value = None
    for n in (512, 384, 256, 128):
        # the remote compile service is occasionally flaky — retry per size
        for attempt in range(3):
            try:
                value, per_step = run(n)
                print(f"[bench] {n}^3: {per_step * 1e3:.2f} ms/step -> "
                      f"{value / 1e9:.3f} Gcell/s", file=sys.stderr)
                break
            except Exception as e:  # OOM or compile failure
                print(f"[bench] {n}^3 attempt {attempt}: "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                value = None
        if value is not None:
            break
    if value is None:
        print(json.dumps({"metric": "adi_cell_updates_per_s_per_chip",
                          "value": 0.0, "unit": "cell/s", "vs_baseline": 0.0}))
        return
    print(json.dumps({
        "metric": f"adi_cell_updates_per_s_per_chip_{n}^3_f32",
        "value": value,
        "unit": "cell/s",
        "vs_baseline": value / SOL_CELLS_PER_S,
    }))


if __name__ == "__main__":
    if "--case" in sys.argv and "cylindrical" in sys.argv:
        main_cylindrical()
    elif "--case" in sys.argv and "bf16" in sys.argv:
        main_bf16()
    elif "--case" in sys.argv and "masked" in sys.argv:
        main_masked()
    else:
        main()
