"""Chip gate for the Cartesian tier-2 z solve (VP2_Z_DEFAULT).

Usage: python scripts/vp2z_cart_chip.py [n]   (default 384 — the bench
varprop shape, through the engine exactly as bench.py --case varprop).
Gates: compile probe, on-chip parity (<= 1e-3 K) at a reduced shape,
slope A/B at n^3.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import adi_thermal_fields_tpu.step.cartesian_varprop as cv
from adi_thermal_fields_tpu.apps.engine import make_cartesian_engine
from adi_thermal_fields_tpu.core.grid import CartesianGrid
from adi_thermal_fields_tpu.core.material import Material


def probe():
    x = jnp.full((64, 64, 64), 1.5, jnp.float32)
    t0 = time.perf_counter()
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.swapaxes(x, 1, 2) + 0.5)
    float(f(x).sum())
    el = time.perf_counter() - t0
    print(f"[probe] {el:.1f} s ({'HEALTHY' if el < 30 else 'DEGRADED'})",
          flush=True)
    return el < 30


def build(n):
    grid = CartesianGrid(n, n, n, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    m = np.zeros(grid.shape, bool)
    m[:, :, :n // 2] = True
    m[: (3 * n) // 5, : n // 2, n // 2:n // 2 + n // 8] = True
    mask = jnp.asarray(m)
    T = jnp.where(mask, jnp.float32(1500.0), jnp.float32(20.0))
    kt = cv.melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = cv.apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    prepare, advance = make_cartesian_engine(
        grid, mat, robin_h=15.0, t_inf=20.0, dtype=jnp.float32,
        emissivity=0.5, k_table=kt, cp_table=ct)
    return prepare, advance, T, mask


def run_case(n, flag, steps=24, parity_field=False):
    cv.VP2_Z_DEFAULT = flag
    prepare, advance, T, mask = build(n)
    prep = prepare(mask)
    dt = jnp.asarray(0.02, jnp.float32)
    probe_s = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]))
    T1 = advance(T, prep, dt, jnp.int32(1), 0.0)
    float(probe_s(T1))
    if parity_field:
        return np.asarray(T1)
    k = max(1, steps // 4)

    def loop(m):
        T2 = T1
        for i in range(m):
            T2 = advance(T2, prep, dt, jnp.int32(i + 2), 0.0)
        return float(probe_s(T2))

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    print(f"[vp2z cart gate] {n}^3 on {jax.devices()}", flush=True)
    healthy = probe()
    a = run_case(128, False, parity_field=True)
    b = run_case(128, True, parity_field=True)
    print(f"[parity 128^3] max |diff| = {np.abs(a - b).max():.3e} K",
          flush=True)
    assert np.abs(a - b).max() <= 1e-3, "cartesian vp2-z parity FAILED"
    for name, flag in (("classic-z", False), ("vp2-z", True)):
        ms = run_case(n, flag)
        print(f"[{name}] {ms:.2f} ms/step = {n**3/ms/1e6:.2f} Gcell/s"
              f"{'' if healthy else '  (DEGRADED window - timing suspect)'}",
              flush=True)


if __name__ == "__main__":
    main()
