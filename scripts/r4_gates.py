"""Round-4 session-B pending chip gates, in one run (healthy window only):

  1. Cartesian varprop tier-2 y/z solves (VP2_Y_DEFAULT / VP2_Z_DEFAULT):
     parity at 128^3 through the engine, then slope A/B at 384^3 over
     {classic, +z, +y+z}.
  2. bf16 natural-layout z (Z_NAT_BF16_DEFAULT): parity + slope A/B at
     512^3 on the const-prop lite step.

Usage: python scripts/r4_gates.py [--skip-bf16]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import adi_thermal_fields_tpu.step.cartesian_pallas as cp_mod
import adi_thermal_fields_tpu.step.cartesian_varprop as cv


def probe():
    x = jnp.full((64, 64, 64), 1.5, jnp.float32)
    t0 = time.perf_counter()
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.swapaxes(x, 1, 2) + 0.5)
    float(f(x).sum())
    el = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(30):
        float(f(x).sum())
    ex = (time.perf_counter() - t0) / 30
    ok = el < 30 and ex < 0.05
    print(f"[probe] compile {el:.1f} s, exec {ex*1e3:.1f} ms "
          f"({'HEALTHY' if ok else 'DEGRADED'})", flush=True)
    return ok


def slope3(loop, steps):
    k = max(1, steps // 4)
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


# --- Cartesian varprop vp2 y/z (engine, the bench varprop config) ----------

def vp_build(n):
    from adi_thermal_fields_tpu.apps.engine import make_cartesian_engine
    from adi_thermal_fields_tpu.core.grid import CartesianGrid
    from adi_thermal_fields_tpu.core.material import Material

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


def vp_case(n, y, z, steps=24, parity_field=False):
    cv.VP2_Y_DEFAULT = y
    cv.VP2_Z_DEFAULT = z
    prepare, advance, T, mask = vp_build(n)
    prep = prepare(mask)
    dt = jnp.asarray(0.02, jnp.float32)
    probe_s = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]))
    T1 = advance(T, prep, dt, jnp.int32(1), 0.0)
    float(probe_s(T1))
    if parity_field:
        return np.asarray(T1)

    # ONE advance call with m sub-steps (lax.fori inside the jit): the
    # 2026-08-20 05:02 gate run called advance per step with n_sub=i+2,
    # inflating every wall-clock ~19.6x (sum of sub-steps) — the RATIOS
    # were valid (same inflation per leg: classic 293.79 -> vp2-z 277.44
    # = 0.944x, vp2-yz 329.01 = 1.12x SLOWER) and 293.79/19.58 = 15.0 ms
    # reproduces the same-morning bench exactly, but absolute per-step
    # numbers from that run must be divided by the inflation factor.
    def loop(m):
        return float(probe_s(advance(T1, prep, dt, jnp.int32(m), 0.0)))

    return slope3(loop, steps)


def gate_cart_vp2(n=384):
    a = vp_case(128, False, False, parity_field=True)
    for name, y, z in (("+z", False, True), ("+y+z", True, True)):
        b = vp_case(128, y, z, parity_field=True)
        print(f"[cart vp2 parity 128^3 {name}] max|diff| = "
              f"{np.abs(a - b).max():.3e} K", flush=True)
        # 5e-3 K on a ~1500 C field = ~30 f32 ulps: the vp2 tier's
        # scaled-row elimination (round 5) rounds differently from the
        # vp-fields tier, same system either way
        assert np.abs(a - b).max() <= 5e-3
    best, best_ms = (False, False), None
    for name, y, z in (("classic", False, False), ("vp2-z", False, True),
                       ("vp2-yz", True, True)):
        ms = vp_case(n, y, z)
        print(f"[cart varprop {n}^3 {name}] {ms:.2f} ms/step = "
              f"{n**3/ms/1e6:.2f} Gcell/s", flush=True)
        if best_ms is None or ms < best_ms:
            best, best_ms = (y, z), ms
    # 576^3 scaling record with the engine pad-to-tile fix (VERDICT r3 #7:
    # the unpadded path measured 89.6 ms = 2.13 Gcell/s in session A)
    for m in (512, 576):
        ms = vp_case(m, *best, steps=12)
        print(f"[cart varprop {m}^3 best{best}] {ms:.2f} ms/step = "
              f"{m**3/ms/1e6:.2f} Gcell/s", flush=True)


# --- bf16 natural z (const-prop lite) ---------------------------------------

def bf16_case(n, flag, steps=24, parity_field=False):
    import functools

    from adi_thermal_fields_tpu.core.grid import CartesianGrid
    from adi_thermal_fields_tpu.core.material import Material

    cp_mod.Z_NAT_BF16_DEFAULT = flag
    grid = CartesianGrid(n, n, n, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    m = np.zeros(grid.shape, bool)
    m[:, :, :n // 2] = True
    m[: (3 * n) // 5, : n // 2, n // 2:n // 2 + n // 8] = True
    mask = jnp.asarray(m)
    rob_c = 200.0 / (mat.rho * mat.cp * grid.dx)
    plan = jax.jit(lambda mk: cp_mod.build_sweep_plan(
        mk, None, has_neumann=False, has_dirichlet=False,
        robin_const=rob_c, pad_to_tile=True))(mask)
    T = jax.jit(cp_mod.pad_domain)(
        jnp.where(mask, jnp.bfloat16(900.0), jnp.bfloat16(20.0)))

    # plan passed as a jit ARGUMENT: closing over it embeds the 512^3 plan
    # arrays as HLO constants and the remote compile rejects the upload
    # (HTTP 413 -- NOTES round-3 rule)
    @functools.partial(jax.jit, donate_argnums=0)
    def step(T, plan, dt):
        return cp_mod.adi_step_pallas(T, plan, grid, mat, dt=dt,
                                      theta=0.5, t_inf=20.0)

    probe_s = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]
                                        .astype(jnp.float32)))
    dt = jnp.asarray(0.05, jnp.float32)
    T1 = step(jnp.copy(T), plan, dt)
    float(probe_s(T1))
    if parity_field:
        return np.asarray(T1, np.float32)

    def loop(k):
        T2 = jnp.copy(T1)
        for _ in range(k):
            T2 = step(T2, plan, dt)
        return float(probe_s(T2))

    return slope3(loop, steps)


def gate_bf16(n=512):
    a = bf16_case(128, False, parity_field=True)
    b = bf16_case(128, True, parity_field=True)
    print(f"[bf16 znat parity 128^3] max|diff| = {np.abs(a-b).max():.3e} K",
          flush=True)
    assert np.abs(a - b).max() <= 2.0     # one bf16 ulp at ~900 C is ~4
    for name, flag in (("transposed-z", False), ("natural-z", True)):
        ms = bf16_case(n, flag)
        print(f"[bf16 {n}^3 {name}] {ms:.2f} ms/step = "
              f"{n**3/ms/1e6:.2f} Gcell/s", flush=True)


if __name__ == "__main__":
    print(f"[r4 gates] {jax.devices()}", flush=True)
    healthy = probe()
    if not healthy:
        print("[r4 gates] DEGRADED window — aborting (rerun when healthy)",
              flush=True)
        sys.exit(2)
    gate_cart_vp2()
    if "--skip-bf16" not in sys.argv:
        gate_bf16()
