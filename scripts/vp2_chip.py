"""Chip gate for the tier-2 fully-fused cyl-varprop kernels (pallas_vp2).

Usage: python scripts/vp2_chip.py [nr nphi nz]   (default 64 512 1024 —
the bench flagship shape).  Gates, in order:
  1. compile probe (degraded-window detection, NOTES.md environment rule);
  2. on-chip parity: vp2=True vs the vp-fields tier on the bench masked
     radiative configuration (must agree <= 1e-3 K — same contract as the
     session-H z-leading gate);
  3. slope-timed A/B (median of 3) at the flagship shape.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from adi_thermal_fields_tpu import (CylindricalGrid, Material, RobinBC,
                                    ZFaceBC)
from adi_thermal_fields_tpu.step.cartesian_varprop import (
    apparent_cp, melt_pool_enhanced_k)
from adi_thermal_fields_tpu.step.cylindrical_varprop import (
    adi_step_cyl_varprop)


def probe():
    x = jnp.full((64, 64, 64), 1.5, jnp.float32)
    t0 = time.perf_counter()
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.swapaxes(x, 1, 2) + 0.5)
    float(f(x).sum())
    el = time.perf_counter() - t0
    print(f"[probe] {el:.1f} s ({'HEALTHY' if el < 30 else 'DEGRADED'})",
          flush=True)
    return el < 30


def setup(shape):
    nr, nphi, nz = shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    rob = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    act = np.zeros(shape, bool)
    act[:, :, :nz // 2] = True
    act[:, :(3 * nphi) // 5, nz // 2:nz // 2 + nz // 8] = True
    active = jnp.asarray(act)

    def mkstep(vp2):
        @jax.jit
        def step(T, active, dt):
            return adi_step_cyl_varprop(
                T, grid, mat, dt=dt, robin_outer=rob, zbc=zbc,
                robin_inner=RobinBC(50.0, 20.0), active=active,
                h_void=80.0, T_inf_void=20.0, h_front=200.0, k_table=kt,
                cp_table=ct, emissivity=0.5, vp2=vp2)
        return step

    T0 = jnp.where(active, 1600.0, 20.0).astype(jnp.float32)
    return mkstep, T0, active


def slope(step, T0, active, dt, steps=24):
    k = max(1, steps // 4)
    probe_s = jax.jit(lambda x: jnp.sum(x[::16, ::64, ::64]))

    def loop(m):
        T = T0
        for _ in range(m):
            T = step(T, active, dt)
        return float(probe_s(T))

    loop(k)                       # compile + warm
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop(k)
        t1 = time.perf_counter()
        loop(k + steps)
        t2 = time.perf_counter()
        best.append(((t2 - t1) - (t1 - t0)) / steps)
    return float(np.median(best)) * 1e3


def main():
    shape = (tuple(int(v) for v in sys.argv[1:4]) if len(sys.argv) > 3
             else (64, 512, 1024))
    print(f"[vp2 gate] shape {shape} on {jax.devices()}", flush=True)
    healthy = probe()
    mkstep, T0, active = setup(shape)
    dt = jnp.asarray(0.02, jnp.float32)

    # parity on a reduced shape first (fast compile), then flagship
    par_shape = (shape[0], min(shape[1], 128), min(shape[2], 256))
    mk_p, T0_p, act_p = setup(par_shape)
    t0 = time.perf_counter()
    a = mk_p(False)(T0_p, act_p, dt)
    b = mk_p(True)(T0_p, act_p, dt)
    a, b = np.asarray(a), np.asarray(b)
    print(f"[parity {par_shape}] compile+run {time.perf_counter()-t0:.1f} s "
          f"max |diff| = {np.abs(a - b).max():.3e} K", flush=True)
    # scaled-row elimination (round 5) rounds differently: 5e-3 K bar
    assert np.abs(a - b).max() <= 5e-3, "vp2 parity FAILED"

    cells = shape[0] * shape[1] * shape[2]
    for name, vp2 in (("classic", False), ("vp2", True)):
        step = mkstep(vp2)
        ms = slope(step, T0, active, dt)
        print(f"[{name}] {ms:.2f} ms/step = {cells/ms/1e6:.2f} Gcell/s"
              f"{'' if healthy else '  (DEGRADED window - timing suspect)'}",
              flush=True)


if __name__ == "__main__":
    main()
