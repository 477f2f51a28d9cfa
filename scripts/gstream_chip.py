"""Chip gate for the g-stream varprop tier (solvers/pallas_gstreams.py).

Round-3 Mosaic rule (NOTES.md): no new kernel is done until it COMPILES on
real hardware — sub-tile DMA hazards are invisible in interpret mode.  On
the real chip this script:

  1. compile-checks adi_step_varprop_gstreams in every mode (f32 scalar-h /
     radiative / h-field stream / source; bf16; bf16 + stochastic);
  2. checks on-chip parity of the full step vs the classic fused tier
     (expected agreement: f32 stream rounding, rel ~1e-5);
  3. slope-A/Bs the g-tier against the classic tier at --n^3, scalar-h and
     in-register radiative film (the classic tier's radiative comparison
     INCLUDES its XLA radiative_h pass — that is the production chain the
     tier replaces).

If all gates pass and the A/B wins, flip
step/cartesian_varprop.G_STREAMS_DEFAULT to True.
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
    ap.add_argument("--skip_small", action="store_true")
    ap.add_argument("--mask_heavy", action="store_true",
                    help="A/B on a WAAM-like part-deposited mask instead "
                         "of the all-solid cube")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adi_thermal_fields_tpu.bc.radiation import radiative_h
    from adi_thermal_fields_tpu.core.grid import CartesianGrid
    from adi_thermal_fields_tpu.core.material import Material
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        PropertyTable, adi_step_varprop_fused, adi_step_varprop_gstreams,
        build_varprop_codes)

    print("devices:", jax.devices())

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

    def gstep(T, *, h=None, eps=None, src=None, seed=None,
              dtype=jnp.float32):
        return adi_step_varprop_gstreams(
            T.astype(dtype), mask_s, gs, mat, k_table=kt, cp_table=ct,
            dt=jnp.float32(0.02), theta=0.5, t_inf=20.0,
            robin_h=0.0 if (h is not None or eps is not None) else 15.0,
            h_field=h, emissivity=eps, h_conv=8.0 if eps is not None
            else 0.0, source=src, rng_seed=seed, interpret=False)

    def cstep(T, *, h=None, eps=None, src=None, seed=None,
              dtype=jnp.float32):
        if eps is not None and h is None:
            h = radiative_h(T.astype(dtype), eps, 20.0, h_conv=8.0)
        return adi_step_varprop_fused(
            T.astype(dtype), mask_s, codes_s, gs, mat, k_table=kt,
            cp_table=ct, dt=jnp.float32(0.02), theta=0.5, t_inf=20.0,
            robin_h=0.0 if h is not None else 15.0, h_field=h, source=src,
            rng_seed=seed, interpret=False, gstreams=False)

    modes = [("f32 scalar-h", {}),
             ("f32 radiative", {"eps": 0.6}),
             ("f32 h-field", {"h": hf_s}),
             ("f32 src", {"src": src_s}),
             ("f32 rad+src", {"eps": 0.6, "src": src_s}),
             ("bf16", {"dtype": jnp.bfloat16}),
             ("bf16 stochastic", {"dtype": jnp.bfloat16, "seed": 7})]
    if not args.skip_small:
        for tag, kw in modes:
            t0 = time.perf_counter()
            out = gstep(T_s, **kw)
            v = float(out.astype(jnp.float32).mean())
            print(f"[compile] {tag}: OK mean={v:.3f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
            assert np.isfinite(v), tag

        for tag, kw in modes[:5]:
            a = gstep(T_s, **kw)
            b = cstep(T_s, **kw)
            d = float(jnp.max(jnp.abs(a - b)))
            rel = d / 900.0
            print(f"[parity] {tag}: maxdiff={d:.3e} (rel {rel:.2e})",
                  flush=True)
            assert rel < 2e-5, (tag, d)

    # --- slope A/B at n^3 -------------------------------------------------
    # --mask_heavy: the domain class the tier was KEPT for (VERDICT r3 #6
    # keep-or-kill) — a WAAM-like plate + part-deposited block (~56% solid)
    # where the g-streams shed the code stream the classic sweeps decode
    n = args.n
    gl = CartesianGrid(n, n, n, 1e-3)
    if args.mask_heavy:
        m = np.zeros(gl.shape, bool)
        m[:, :, : n // 2] = True
        m[n // 8: 5 * n // 8, n // 8: 5 * n // 8, n // 2: 3 * n // 4] = True
        mask_l = jnp.asarray(m)
        print(f"[mask] mask-heavy domain: {m.mean() * 100:.0f}% solid")
    else:
        mask_l = jnp.ones(gl.shape, bool)
    codes_l = jax.jit(build_varprop_codes)(mask_l)
    T0 = jnp.where(mask_l, 900.0, 20.0).astype(jnp.float32)

    def mk(tier, eps, dtype=jnp.float32):
        T00 = T0.astype(dtype)

        @jax.jit
        def f(T):
            if tier == "g":
                return adi_step_varprop_gstreams(
                    T, mask_l, gl, mat, k_table=kt, cp_table=ct,
                    dt=jnp.float32(1e-4), theta=0.5, t_inf=20.0,
                    robin_h=0.0 if eps else 15.0, emissivity=eps,
                    rng_seed=3 if dtype == jnp.bfloat16 else None,
                    interpret=False)
            h = radiative_h(T, eps, 20.0) if eps else None
            return adi_step_varprop_fused(
                T, mask_l, codes_l, gl, mat, k_table=kt, cp_table=ct,
                dt=jnp.float32(1e-4), theta=0.5, t_inf=20.0,
                robin_h=0.0 if eps else 15.0, h_field=h,
                rng_seed=3 if dtype == jnp.bfloat16 else None,
                interpret=False, gstreams=False)
        return lambda T: f(T00 if T is None else T)

    cases = [(None, jnp.float32, "f32 scalar-h"),
             (0.6, jnp.float32, "f32 radiative"),
             (None, jnp.bfloat16, "bf16 scalar-h")]
    for eps, dtype, htag in cases:
        t_c = slope(mk("c", eps, dtype))
        t_g = slope(mk("g", eps, dtype))
        cells = n ** 3
        print(f"[A/B {htag} {n}^3] classic {t_c * 1e3:.2f} ms "
              f"({cells / t_c / 1e9:.2f} Gcell/s)  "
              f"gstream {t_g * 1e3:.2f} ms ({cells / t_g / 1e9:.2f} "
              f"Gcell/s)  speedup {t_c / t_g:.3f}x", flush=True)

    print("ALL GATES PASSED — flip G_STREAMS_DEFAULT if the A/B wins.")


if __name__ == "__main__":
    main()
