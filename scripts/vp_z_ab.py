"""Isolate the Cartesian varprop z-leg regression (round 4: 13.46 ->
14.77 ms at 384^3 radiative).  Slope-times the z-solve leg in four forms:

  A. round-3 path: 3 finished-stream transposes + transposed rhs ->
     classic axis-0 varprop kernel -> transpose back
  B. z-leading rebuild (Tz/mz + re-eval) + classic kernel + rhs/out pair
  C. z-leading rebuild + NATURAL rhs/out kernel      (current default)
  D. natural streams as built, XLA-transposed to z-leading + NATURAL
     rhs/out kernel (isolates: rebuild-vs-transpose for the streams,
     independent of the rhs/out pair)

Run on the real chip: python scripts/vp_z_ab.py [n]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from adi_thermal_fields_tpu.bc.radiation import radiative_h
from adi_thermal_fields_tpu.core.grid import CartesianGrid
from adi_thermal_fields_tpu.core.material import Material
from adi_thermal_fields_tpu.solvers.pallas_varprop import fused_varprop_sweep
from adi_thermal_fields_tpu.step.cartesian_varprop import (
    _ev_tab, _face_g, apparent_cp, build_varprop_codes, build_varprop_fields,
    melt_pool_enhanced_k)


def probe():
    x = jnp.full((64, 64, 64), 1.5, jnp.float32)
    t0 = time.perf_counter()
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.swapaxes(x, 1, 2) + 0.5)
    float(f(x).sum())
    el = time.perf_counter() - t0
    print(f"[probe] {el:.1f} s ({'HEALTHY' if el < 30 else 'DEGRADED'})")


def slope(fn, x0, steps=16):
    k = max(1, steps // 4)

    def loop(m):
        x = x0
        for _ in range(m):
            x = fn(x)
        return float(jnp.sum(x[::64, ::64, ::64]))

    loop(k)
    vals = []
    for _ in range(3):
        t0 = time.perf_counter(); loop(k); t1 = time.perf_counter()
        loop(steps); t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (steps - k))
    vals.sort()
    return vals[1] * 1e3


def main():
    probe()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    grid = CartesianGrid(n, n, n, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    mask = jnp.ones(grid.shape, bool)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    codes = build_varprop_codes(mask)
    eps, t_inf = 0.5, 20.0
    dt = jnp.float32(0.02)
    theta = 0.5
    inv_d2 = 1.0 / (grid.dx * grid.dx)
    tg = theta * dt * inv_d2
    sk = dt / grid.dx
    V0 = jnp.full(grid.shape, 900.0, jnp.float32)
    t2n = lambda x: jnp.transpose(x, (2, 0, 1))
    dtype = jnp.float32

    def prep_nat(T, mask):
        """natural-layout streams exactly as the step builds them"""
        fc, w = build_varprop_fields(T, mask, mat, kt, ct, use_kernel=True)
        hf = radiative_h(T, eps, t_inf, h_conv=15.0)
        return fc[2], w, hf

    def prep_zlead(T, mask):
        """z-leading rebuild from T/mask transposes (current default)"""
        Tz = t2n(T)
        mz = t2n(mask)
        kz = _ev_tab(kt, mat.k, Tz, dtype)
        fcz = _face_g(kz, 0, -1, mz).astype(dtype)
        wz = (1.0 / (mat.rho * _ev_tab(ct, mat.cp, Tz, dtype))).astype(dtype)
        hz = radiative_h(Tz, eps, t_inf, h_conv=15.0)
        return fcz, wz, hz

    T = jnp.full(grid.shape, 900.0, jnp.float32) + \
        jnp.linspace(0, 600, n)[None, None, :]
    cz = codes[2]

    # big arrays as ARGUMENTS (closed-over arrays become HLO constants
    # and the remote compile service 413s on the upload — NOTES.md)
    @jax.jit
    def legA(V, T, cz, mk):
        fcz, wz, hz = (t2n(s) for s in prep_nat(T, mk))
        W = fused_varprop_sweep(t2n(V), cz, fcz, wz, tg, sk, t_inf,
                                h=hz, rob_c=0.0)
        return jnp.transpose(W, (1, 2, 0))

    @jax.jit
    def legB(V, T, cz, mk):
        fcz, wz, hz = prep_zlead(T, mk)
        W = fused_varprop_sweep(t2n(V), cz, fcz, wz, tg, sk, t_inf,
                                h=hz, rob_c=0.0)
        return jnp.transpose(W, (1, 2, 0))

    @jax.jit
    def legC(V, T, cz, mk):
        fcz, wz, hz = prep_zlead(T, mk)
        return fused_varprop_sweep(V, cz, fcz, wz, tg, sk, t_inf,
                                   h=hz, rob_c=0.0, nat_rhs_out=True)

    @jax.jit
    def legD(V, T, cz, mk):
        fcn, wn, hn = prep_nat(T, mk)      # natural streams, as the step has
        fcz, wz, hz = t2n(fcn), t2n(wn), t2n(hn)
        return fused_varprop_sweep(V, cz, fcz, wz, tg, sk, t_inf,
                                   h=hz, rob_c=0.0, nat_rhs_out=True)

    # parity first (cheap shapes already covered; here sanity at n)
    a = legA(V0, T, cz, mask); b = legB(V0, T, cz, mask); c = legC(V0, T, cz, mask)
    print(f"[parity] B-A {float(jnp.max(jnp.abs(b - a))):.2e}  "
          f"C-A {float(jnp.max(jnp.abs(c - a))):.2e}")

    for name, leg in (("A r3: stream-t2 + classic + pair", legA),
                      ("B zlead rebuild + classic + pair", legB),
                      ("C zlead rebuild + NAT kernel    ", legC),
                      ("D stream-t2 + NAT kernel        ", legD)):
        ms = slope(lambda V, f=leg: f(V, T, cz, mask), V0)
        print(f"[z-leg {name}] {ms:.2f} ms")


if __name__ == "__main__":
    main()
