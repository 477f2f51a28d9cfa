"""Chip gate for the natural-layout z sweep (fused_sweep_axis2_v2).

1. Mosaic compile + bitwise parity vs the transposed axis-0 chain at a
   moderate shape (the in-kernel lane<->sublane transposes are the novel
   lowering — interpret mode cannot vouch for them).
2. Slope-timed A/B at 512^3: [t2 -> axis0_v2 -> t2] vs [axis2_v2], the
   3.22 ms transpose-pair attack (VERDICT r4 #2).

Run on the real chip: python scripts/znat_chip.py [n]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from adi_thermal_fields_tpu.solvers.pallas_sweeps import (
    fused_sweep_axis0_v2, fused_sweep_axis2_v2, sweep_code)


def probe():
    x = jnp.full((64, 64, 64), 1.5, jnp.float32)
    t0 = time.perf_counter()
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.swapaxes(x, 1, 2) + 0.5)
    float(f(x).sum())
    el = time.perf_counter() - t0
    print(f"[probe] {el:.1f} s ({'HEALTHY' if el < 30 else 'DEGRADED'})")


def slope(fn, *args, steps=24):
    """Per-call ms via the slope method (cancels the fixed tunnel offset)."""
    k = max(1, steps // 4)

    def loop(m):
        o = args[0]
        for _ in range(m):
            o = fn(o, *args[1:])
        return float(jnp.sum(o[::64, ::64]))

    loop(k)
    vals = []
    for _ in range(3):
        t0 = time.perf_counter(); loop(k); t1 = time.perf_counter()
        loop(steps); t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (steps - k))
    vals.sort()
    return vals[1] * 1e3, (vals[-1] - vals[0]) / vals[1]


def main():
    probe()
    tg, dt, t_inf, rob_c = 0.3, 0.01, 20.0, 0.05

    # -- gate 1: compile + parity ------------------------------------------
    rng = np.random.default_rng(3)
    shape = (128, 128, 128)
    mask = jnp.asarray(rng.random(shape) < 0.85)
    rhs = (jnp.asarray(rng.random(shape)) * 100).astype(jnp.float32)
    code_z = sweep_code(mask, None, 2)

    t0 = time.perf_counter()
    got = jax.jit(lambda r: fused_sweep_axis2_v2(
        r, code_z, tg, dt, t_inf, rob_c))(rhs)
    got.block_until_ready()
    print(f"[gate1] axis2_v2 COMPILED on chip in "
          f"{time.perf_counter() - t0:.1f} s")
    want = jnp.transpose(
        jax.jit(lambda r: fused_sweep_axis0_v2(
            jnp.transpose(r, (2, 0, 1)), code_z, None, tg, dt, t_inf,
            rob_c=rob_c))(rhs), (1, 2, 0))
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"[gate1] parity max|diff| = {err:.3e}")
    assert err == 0.0, f"parity FAILED: {err}"

    # -- gate 2: 512^3 A/B --------------------------------------------------
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    shape = (n, n, n)
    mask_np = np.ones(shape, bool)
    mask_np[:, :, (3 * n) // 4:] = False
    mask = jnp.asarray(mask_np)
    code_z = sweep_code(mask, None, 2)
    rhs = jnp.where(mask, 900.0, 20.0).astype(jnp.float32)

    old = jax.jit(lambda r: jnp.transpose(fused_sweep_axis0_v2(
        jnp.transpose(r, (2, 0, 1)), code_z, None, tg, dt, t_inf,
        rob_c=rob_c), (1, 2, 0)))
    new = jax.jit(lambda r: fused_sweep_axis2_v2(
        r, code_z, tg, dt, t_inf, rob_c))

    ms_old, sp_old = slope(old, rhs)
    ms_new, sp_new = slope(new, rhs)
    gb = n * n * n * 9 / 1e9
    print(f"[gate2] {n}^3 old (t2+axis0+t2): {ms_old:.2f} ms "
          f"(spread {sp_old * 100:.0f}%)  [{(gb + n**3 * 16 / 1e9) / ms_old * 1e3:.0f} GB/s at 25 B]")
    print(f"[gate2] {n}^3 new (axis2 nat):   {ms_new:.2f} ms "
          f"(spread {sp_new * 100:.0f}%)  [{gb / ms_new * 1e3:.0f} GB/s at 9 B]")
    print(f"[gate2] speedup {ms_old / ms_new:.2f}x")


if __name__ == "__main__":
    main()
