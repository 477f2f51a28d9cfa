"""Capture + parse a device trace of the compressed cylindrical varprop
step — where do the ~350 B/cell-equivalent go?  (The compressed stream
kernels are 24-28 B/cell/sweep; the rest is XLA build/prefold passes.)

Reuses trace_512.op_breakdown (chrome-trace json.gz parse)."""
import argparse
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from trace_512 import op_breakdown  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(64, 512, 256))
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--logdir", default="/tmp/trace_cylvp")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--birth", action="store_true",
                    help="part-deposited tube with interface films (the "
                         "bench --case cyl_varprop configuration)")
    args = ap.parse_args()

    if not args.parse_only:
        import functools

        import jax
        import jax.numpy as jnp

        from adi_thermal_fields_tpu.core.grid import CylindricalGrid
        from adi_thermal_fields_tpu.core.material import Material
        from adi_thermal_fields_tpu.io.profiling import trace
        from adi_thermal_fields_tpu.step.cylindrical import RobinBC, ZFaceBC
        from adi_thermal_fields_tpu.step.cylindrical_varprop import (
            adi_step_cyl_varprop)
        from adi_thermal_fields_tpu.step.cartesian_varprop import (
            apparent_cp, melt_pool_enhanced_k)

        nr, nphi, nz = args.shape
        grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
        mat = Material(7800.0, 490.0, 54.0)
        kw = dict(
            robin_outer=RobinBC(200.0, 20.0),
            zbc=ZFaceBC(kind_top="robin", h_top=100.0, T_inf_top=20.0),
            k_table=melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, 4.0),
            cp_table=apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0),
            emissivity=0.5, implementation="pallas")
        if args.birth:
            import numpy as np
            act = np.zeros(grid.shape, bool)
            act[:, :, : (2 * nz) // 3] = True     # part-built tube
            kw.update(active=jnp.asarray(act), h_void=12.0,
                      T_inf_void=20.0, h_front=25.0)

        @functools.partial(jax.jit, donate_argnums=0)
        def step(T):
            return adi_step_cyl_varprop(T, grid, mat, dt=jnp.float32(0.02),
                                        **kw)

        probe = jax.jit(lambda x: jnp.sum(x[::16, ::64, ::64]))
        T = jnp.full(grid.shape, 1500.0, jnp.float32)
        T = step(T)
        float(probe(T))
        with trace(args.logdir):
            for _ in range(args.steps):
                T = step(T)
            float(probe(T))

    rows = op_breakdown(args.logdir)
    if rows:
        total = sum(v for _, v in rows)
        print(f"[trace] device op self-time over {args.steps} steps "
              f"(total {total / 1e3:.2f} ms, "
              f"{total / 1e3 / args.steps:.2f} ms/step):")
        for name, us in rows[:30]:
            print(f"  {us / 1e3:9.3f} ms  {100 * us / total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
