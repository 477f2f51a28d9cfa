"""Per-kernel slope timing of the g-stream varprop tier at --n^3 (chip)."""
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

    from adi_thermal_fields_tpu.core.grid import CartesianGrid
    from adi_thermal_fields_tpu.core.material import Material
    from adi_thermal_fields_tpu.solvers.pallas_gstreams import (
        gstream_fields, gstream_sweep, gstream_sweep_axis1,
        gstream_theta_sweep)
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        PropertyTable, _table_spec)

    n = args.n
    cells = n ** 3
    gl = CartesianGrid(n, n, n, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    kt = PropertyTable((20.0, 1500.0), (40.0, 30.0))
    ct = PropertyTable((20.0, 1500.0), (450.0, 800.0))
    mask = jnp.ones(gl.shape, jnp.int8)
    T0 = jnp.full(gl.shape, 900.0, jnp.float32)
    dt = jnp.float32(1e-4)
    theta = 0.5
    tg3 = jnp.stack([theta * dt / d ** 2 for d in gl.spacing])
    sk3 = jnp.stack([dt / d for d in gl.spacing])
    ks = _table_spec(kt, mat.k)
    cs = _table_spec(ct, mat.cp)

    @jax.jit
    def fields(T):
        return gstream_fields(T, mask, tg3, sk3, 0.6, 20.0, 8.0, dt,
                              k_spec=ks, cp_spec=cs, rho=mat.rho,
                              h_mode="rad")

    g_lo, g_hi, sw, _ = fields(T0)
    t = slope(lambda r: fields(
        T0 if r is None else T0 + 0.0 * r.ravel()[0])[0][0])
    print(f"fields (45 B): {t * 1e3:.2f} ms  {cells * 45 / t / 1e9:.0f} GB/s",
          flush=True)

    @jax.jit
    def ring(T, gl, gh, sx):
        return gstream_theta_sweep(T, gl[0], gh[0], gl[1], gh[1],
                                   gl[2], gh[2], sx, 1.0, 20.0)

    t = slope(lambda r: ring(T0 if r is None else r, g_lo, g_hi, sw[0]))
    print(f"theta+x ring (36 B): {t * 1e3:.2f} ms  "
          f"{cells * 36 / t / 1e9:.0f} GB/s", flush=True)

    @jax.jit
    def ysweep(T, gl, gh, sy):
        return gstream_sweep_axis1(T, gl, gh, sy, 20.0)

    t = slope(lambda r: ysweep(T0 if r is None else r, g_lo[1], g_hi[1],
                               sw[1]))
    print(f"y sweep (20 B): {t * 1e3:.2f} ms  {cells * 20 / t / 1e9:.0f} GB/s",
          flush=True)

    t2n = lambda x: jnp.transpose(x, (2, 0, 1))
    glt, ght, swt = t2n(g_lo[2]), t2n(g_hi[2]), t2n(sw[2])

    @jax.jit
    def relay(T):
        return t2n(T)

    t = slope(lambda r: relay(T0 if r is None else r))
    print(f"one transpose (8 B): {t * 1e3:.2f} ms  "
          f"{cells * 8 / t / 1e9:.0f} GB/s", flush=True)

    @jax.jit
    def zsweep(T, gl, gh, sz):
        return gstream_sweep(T, gl, gh, sz, 20.0)

    Tt = t2n(T0)
    t = slope(lambda r: zsweep(Tt if r is None else r, glt, ght, swt))
    print(f"z sweep (20 B): {t * 1e3:.2f} ms  {cells * 20 / t / 1e9:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
