"""Chip gate for the ring-fused varprop theta+x-sweep kernel.

Round-3 Mosaic rule (NOTES.md): no new kernel is done until it COMPILES on
real hardware — sub-tile DMA hazards are invisible in interpret mode.  This
script, run on the real chip:

  1. compile-checks fused_varprop_theta_sweep in every mode (f32 scalar-h /
     h-field / source / h+src; bf16; bf16 + stochastic rounding);
  2. checks on-chip parity of the full step, fuse_theta=True vs False
     (f32, expected agreement: FMA-contraction level, rtol ~1e-5);
  3. slope-A/Bs adi_step_varprop_fused fuse_theta on/off at --n^3.

If all gates pass, flip step/cartesian_varprop.FUSE_THETA_DEFAULT to True.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def slope(fn, steps=12):
    import jax

    k_small = max(1, steps // 4)

    def loop(k):
        r = None
        for _ in range(k):
            r = fn(r)
        jax.block_until_ready(r)
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
    ap.add_argument("--n", type=int, default=384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adi_thermal_fields_tpu.core.grid import CartesianGrid
    from adi_thermal_fields_tpu.core.material import Material
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        PropertyTable, adi_step_varprop_fused, build_varprop_codes)

    print("devices:", jax.devices())

    # --- gate 1: compile every kernel mode on a small grid -------------
    gs = CartesianGrid(64, 48, 136, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    rng = np.random.default_rng(0)
    mask_s = jnp.asarray(rng.random(gs.shape) < 0.85)
    codes_s = jax.jit(build_varprop_codes)(mask_s)
    kt = PropertyTable((20.0, 1500.0), (40.0, 30.0))
    ct = PropertyTable((20.0, 1500.0), (450.0, 800.0))
    T_s = jnp.asarray(rng.random(gs.shape) * 900 + 20, jnp.float32)
    hf_s = jnp.asarray(rng.random(gs.shape) * 40 + 5, jnp.float32)
    src_s = jnp.asarray(rng.random(gs.shape) * 1e6, jnp.float32)

    def step(T, *, fuse, h=None, src=None, seed=None, dtype=jnp.float32):
        return adi_step_varprop_fused(
            T.astype(dtype), mask_s, codes_s, gs, mat, k_table=kt,
            cp_table=ct, dt=jnp.float32(0.02), theta=0.5, t_inf=20.0,
            robin_h=0.0 if h is not None else 15.0, h_field=h, source=src,
            rng_seed=seed, interpret=False, fuse_theta=fuse)

    modes = [("f32 scalar-h", {}),
             ("f32 h-field", {"h": hf_s}),
             ("f32 src", {"src": src_s}),
             ("f32 h+src", {"h": hf_s, "src": src_s}),
             ("bf16", {"dtype": jnp.bfloat16}),
             ("bf16 stochastic", {"dtype": jnp.bfloat16, "seed": 7})]
    for tag, kw in modes:
        t0 = time.perf_counter()
        out = step(T_s, fuse=True, **kw)
        v = float(out.astype(jnp.float32).mean())
        print(f"[compile] {tag}: OK mean={v:.3f} "
              f"({time.perf_counter() - t0:.1f}s)")
        assert np.isfinite(v), tag

    # --- gate 2: on-chip parity fused vs unfused (f32) ------------------
    for tag, kw in modes[:4]:
        a = step(T_s, fuse=True, **kw)
        b = step(T_s, fuse=False, **kw)
        d = float(jnp.max(jnp.abs(a - b)))
        rel = d / 900.0
        print(f"[parity] {tag}: maxdiff={d:.3e} (rel {rel:.2e})")
        assert rel < 1e-5, (tag, d)

    # --- gate 3: slope A/B at n^3 ---------------------------------------
    n = args.n
    gl = CartesianGrid(n, n, n, 1e-3)
    mask_l = jnp.ones(gl.shape, bool)
    codes_l = jax.jit(build_varprop_codes)(mask_l)
    T0 = jnp.full(gl.shape, 900.0, jnp.float32)
    hf_l = jnp.full(gl.shape, 25.0, jnp.float32)

    def mk(fuse, h):
        @jax.jit
        def f(T):
            return adi_step_varprop_fused(
                T, mask_l, codes_l, gl, mat, k_table=kt, cp_table=ct,
                dt=jnp.float32(1e-4), theta=0.5, t_inf=20.0,
                robin_h=0.0 if h is not None else 15.0, h_field=h,
                interpret=False, fuse_theta=fuse)
        return lambda T: f(T0 if T is None else T)

    for h, htag in ((None, "scalar-h"), (hf_l, "radiative-h")):
        t_off = slope(mk(False, h))
        t_on = slope(mk(True, h))
        cells = n ** 3
        print(f"[A/B {htag} {n}^3] unfused {t_off * 1e3:.2f} ms "
              f"({cells / t_off / 1e9:.2f} Gcell/s)  "
              f"fused {t_on * 1e3:.2f} ms ({cells / t_on / 1e9:.2f} "
              f"Gcell/s)  speedup {t_off / t_on:.3f}x")

    print("ALL GATES PASSED — flip FUSE_THETA_DEFAULT if the A/B wins.")


if __name__ == "__main__":
    main()
