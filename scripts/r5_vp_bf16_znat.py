"""Chip gate: bf16 states through the NATURAL-layout varprop z solve
(step/cartesian_varprop.Z_NAT_VP_BF16_DEFAULT), plus the g-streams
keep-or-kill re-judgement (VERDICT r4 weak #5) on the same session.

bf16 varprop currently routes to the g-stream tier by default
(G_STREAMS_BF16_DEFAULT) on the strength of ONE 1.034x point; the classic
tier's bf16 z pays a transpose pair that the new nat path removes.  This
script measures, same-session slope A/B at --n^3 radiative (the bench
varprop configuration, engine-free step level):

  A. classic tier, transposed z      (Z_NAT_VP_BF16_DEFAULT=False)
  B. classic tier, natural z         (Z_NAT_VP_BF16_DEFAULT=True)
  C. g-stream tier                   (gstreams=True)

Decision table: if B compiles + parity passes and B < A, flip
Z_NAT_VP_BF16_DEFAULT=True.  If then C is not >= 1.10x faster than
min(A, B), flip G_STREAMS_BF16_DEFAULT=False and schedule
solvers/pallas_gstreams.py for deletion (VERDICT r4 #5's bar).

Usage: python scripts/r5_vp_bf16_znat.py [--n 384] [--force]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np


def main():
    import r4_gates as g
    if not g.probe() and "--force" not in sys.argv:
        print("[r5 bf16 znat] DEGRADED window — aborting", flush=True)
        sys.exit(2)

    n = 384
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])

    import functools

    import jax
    import jax.numpy as jnp

    import adi_thermal_fields_tpu.step.cartesian_varprop as cv
    from adi_thermal_fields_tpu import CartesianGrid, Material

    mat = Material(7800.0, 490.0, 54.0)
    kt = cv.melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = cv.apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)

    def build(m):
        grid = CartesianGrid(m, m, m, 1e-3)
        msk = np.zeros(grid.shape, bool)
        msk[:, :, :m // 2] = True
        msk[: (3 * m) // 5, : m // 2, m // 2:m // 2 + m // 8] = True
        mask = jnp.asarray(msk)
        codes = jax.jit(cv.build_varprop_codes)(mask)
        T = jnp.where(mask, 1500.0, 20.0).astype(jnp.bfloat16)
        return grid, mask, codes, T

    def mk_step(grid, mask, codes, znat, gstreams):
        cv.Z_NAT_VP_BF16_DEFAULT = znat

        @functools.partial(jax.jit, donate_argnums=0)
        def step(T, dt, seed):
            return cv.adi_step_varprop_fused(
                T, mask, codes, grid, mat, k_table=kt, cp_table=ct,
                dt=dt, theta=0.5, t_inf=20.0, robin_h=15.0,
                emissivity=0.5, rng_seed=seed, gstreams=gstreams)
        return step

    # --- parity at 128^3 (seeded stochastic stores differ per-bit; use
    # rng_seed=None -> round-to-nearest for the bitwise check) ------------
    grid, mask, codes, T = build(128)
    probe_s = jax.jit(lambda x: jnp.sum(x[::32, ::32, ::32]
                                        .astype(jnp.float32)))
    dt = jnp.asarray(0.02, jnp.float32)
    outs = {}
    for name, znat, gs in (("classic-t2", False, False),
                           ("classic-nat", True, False)):
        st = mk_step(grid, mask, codes, znat, gs)
        T1 = st(jnp.copy(T), dt, None)
        float(probe_s(T1))
        outs[name] = np.asarray(T1, np.float32)
    dmax = np.abs(outs["classic-t2"] - outs["classic-nat"]).max()
    print(f"[bf16 znat parity 128^3] max|diff| = {dmax:.3e} K", flush=True)
    assert dmax == 0.0, "nat and transposed downcast the same f32 solve"

    # --- slope A/B/C at n^3 ------------------------------------------------
    grid, mask, codes, T = build(n)
    for name, znat, gs in (("A classic-t2", False, False),
                           ("B classic-nat", True, False),
                           ("C gstream", False, True)):
        st = mk_step(grid, mask, codes, znat, gs)
        T1 = st(jnp.copy(T), dt, jnp.int32(1))
        float(probe_s(T1))

        def loop(k, T0=T1, st=st):
            Tc = jnp.copy(T0)
            for i in range(k):
                Tc = st(Tc, dt, jnp.int32(i + 2))
            return float(probe_s(Tc))

        med = []
        kq = 6
        loop(kq)
        for _ in range(3):
            t0 = time.perf_counter()
            loop(kq)
            t1 = time.perf_counter()
            loop(kq + 24)
            t2 = time.perf_counter()
            med.append(((t2 - t1) - (t1 - t0)) / 24)
        ms = float(np.median(med)) * 1e3
        print(f"[bf16 varprop {n}^3 {name}] {ms:.2f} ms/step = "
              f"{n**3/ms/1e6:.2f} Gcell/s", flush=True)


if __name__ == "__main__":
    main()
