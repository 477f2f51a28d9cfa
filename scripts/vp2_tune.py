"""vp2 kernel tile/chunk tuning sweep (healthy window only).

The vp2 tier measured 190 GB/s apparent on its 45 B model (23% of HBM) at
(64,512,1024) — VPU-bound.  This sweeps the remaining free parameters and
times each LEG separately (r / phi / z solves via the step's own
dispatch), so the dominant leg is identified before any op-count surgery.

Usage: python scripts/vp2_tune.py [nr nphi nz]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from adi_thermal_fields_tpu.solvers.pallas_vp2 import (
    build_vp2_code, fused_vp2_cyclic_axis1, fused_vp2_sweep)
from adi_thermal_fields_tpu.step.cartesian_varprop import (
    apparent_cp, melt_pool_enhanced_k)

K_TAB = melt_pool_enhanced_k(54.0, 1420.0, 1470.0, enhancement=4.0)
CP_TAB = apparent_cp(490.0, 490.0, 2.7e5, 1420.0, 1470.0)
K_SPEC = (tuple(float(v) for v in K_TAB.points),
          tuple(float(v) for v in K_TAB.values))
CP_SPEC = (tuple(float(v) for v in CP_TAB.points),
           tuple(float(v) for v in CP_TAB.values))


def probe():
    x = jnp.full((64, 64, 64), 1.5, jnp.float32)
    t0 = time.perf_counter()
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.swapaxes(x, 1, 2) + 0.5)
    float(f(x).sum())
    el = time.perf_counter() - t0
    print(f"[probe] {el:.1f} s ({'HEALTHY' if el < 30 else 'DEGRADED'})",
          flush=True)
    return el < 30


def slope(fn, *args, steps=24):
    k = max(1, steps // 4)

    def loop(m):
        x = None
        for _ in range(m):
            x = fn(*args)
        return float(jnp.sum(x[::16, ::64, ::64]))

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
    shape = (tuple(int(v) for v in sys.argv[1:4]) if len(sys.argv) > 3
             else (64, 512, 1024))
    nr, nphi, nz = shape
    cells = nr * nphi * nz
    print(f"[vp2 tune] {shape} on {jax.devices()}", flush=True)
    probe()
    rng = np.random.default_rng(7)
    act = np.zeros(shape, bool)
    act[:, :, :nz // 2] = True
    act[:, :(3 * nphi) // 5, nz // 2:nz // 2 + nz // 8] = True
    act = jnp.asarray(act)
    T = jnp.where(act, 1600.0, 20.0).astype(jnp.float32) \
        + jnp.asarray(rng.random(shape) * 5, jnp.float32)
    X = T + 1.0
    dtor = jnp.float32(0.02 / 7800.0)
    kw = dict(k_spec=K_SPEC, cp_spec=CP_SPEC, h_lo=80.0, h_hi=200.0,
              tinf_void=20.0, emissivity=0.5)

    # r leg (axis 0, rhs IS T)
    code_r = jax.jit(lambda a: build_vp2_code(a, 0))(act)
    glo = jnp.asarray(0.3 + rng.random(nr), jnp.float32)
    gs = jnp.asarray(0.1 + rng.random(nr), jnp.float32)
    # big arrays must be REAL call-time jit arguments — lambda DEFAULTS
    # still trace as HLO constants (the phi leg 413'd twice on exactly
    # this: 2026-08-20 closures, 2026-08-21 default-args)
    for b2 in (256, 512):
        f = jax.jit(lambda T, c, b2=b2: fused_vp2_sweep(
            None, T, c, glo, glo, gs, gs, dtor, block_b2=b2,
            edge1=(300.0, 1.3, 20.0), **kw))
        ms = slope(f, T, code_r)
        print(f"[r leg b2={b2}] {ms:.2f} ms = "
              f"{cells*9/ms/1e6:.0f} GB/s on 9 B", flush=True)

    # phi leg (cyclic axis 1)
    code_p = jax.jit(lambda a: build_vp2_code(a, 1, periodic=True))(act)
    geo2 = jnp.asarray(0.5 + rng.random((nr, nz)), jnp.float32)
    gs2 = jnp.asarray(0.1 + rng.random((nr, nz)), jnp.float32)
    kwp = dict(k_spec=K_SPEC, cp_spec=CP_SPEC, h_void=80.0,
               tinf_void=20.0, emissivity=0.5)
    for b2 in (128, 256):
        for ch in (64, 128):
            f = jax.jit(lambda X, T, c, b2=b2, ch=ch:
                        fused_vp2_cyclic_axis1(
                            X, T, c, geo2, gs2, dtor, block_b2=b2,
                            chunk=ch, **kwp))
            ms = slope(f, X, T, code_p)
            print(f"[phi leg b2={b2} cn={ch}] {ms:.2f} ms = "
                  f"{cells*13/ms/1e6:.0f} GB/s on 13 B", flush=True)

    # z leg (natural rhs/T/out)
    code_z = jax.jit(lambda a: build_vp2_code(
        jnp.moveaxis(a, 2, 0), 0))(act)
    gloz = jnp.full((nz,), 0.4, jnp.float32)
    gsz = jnp.full((nz,), 0.2, jnp.float32)
    for b2 in (256, 512):
        for ch in (128, 256):
            f = jax.jit(lambda X, T, c, b2=b2, ch=ch: fused_vp2_sweep(
                X, T, c, gloz, gloz, gsz, gsz, dtor,
                nat_rhs_out=True, block_b2=b2, chunk=ch,
                edge1=(400.0, 2.0, 20.0), **kw))
            ms = slope(f, X, T, code_z)
            print(f"[z leg b2={b2} cn={ch}] {ms:.2f} ms = "
                  f"{cells*13/ms/1e6:.0f} GB/s on 13 B", flush=True)


if __name__ == "__main__":
    main()
