"""Capture a jax.profiler trace of the flagship 512^3 fused step and print
an op-level time breakdown.

VERDICT round-2 item 1 asks for recorded profiler evidence behind the
single-chip plateau claim (NOTES.md argues the sweep kernels are
VPU-decode-bound; this script produces the trace that backs or breaks it).

Usage (on the real chip):
    python scripts/trace_512.py [--n 512] [--steps 6] [--logdir /tmp/trace512]

Prints the per-op total self-time from the captured xplane, which on TPU
separates the Pallas kernels (fusion names carry the kernel names) and the
XLA transpose pair.  The raw trace stays in --logdir for TensorBoard/xprof.
"""
import argparse
import glob
import json
import os
import sys

# tensorboard_plugin_profile ships _pb2 files older than the installed
# protobuf's C++ fast path tolerates; the pure-python parser still reads
# them (slower, fine for a one-shot parse).  Must be set before any
# protobuf import anywhere in the process.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def op_breakdown(logdir):
    """Summarize device-side op self-times from the captured trace.

    jax.profiler writes a chrome-trace ``*.trace.json.gz`` next to the
    xplane.pb; parse that directly (the tensorboard_plugin_profile xplane
    converter is broken against the baked-in TF/protobuf pairing)."""
    import gzip

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        print("[trace] no trace.json.gz found under", logdir)
        return None
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    evs = tr["traceEvents"] if isinstance(tr, dict) else tr
    # device pids: names containing "TPU" (skip host threads)
    dev_pids = set()
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e.get("pid"))
    tot = {}
    for e in evs:
        if e.get("ph") == "X" and (not dev_pids or e.get("pid") in dev_pids):
            if e["name"].startswith("jit_"):
                continue      # parent module span — nests the per-op events
            tot[e["name"]] = tot.get(e["name"], 0.0) + e.get("dur", 0.0)
    return sorted(tot.items(), key=lambda kv: -kv[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--logdir", default="/tmp/trace512")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        import functools

        import jax
        import jax.numpy as jnp

        from adi_thermal_fields_tpu.io.profiling import trace
        from adi_thermal_fields_tpu.step.cartesian_pallas import (
            adi_step_pallas, build_sweep_plan, pad_domain)
        from bench import build_case

        grid, mat, T, mask, _ = build_case(args.n, jnp.float32, lite=True)
        rob_c = 200.0 / (mat.rho * mat.cp * grid.dx)
        plan = jax.jit(lambda m: build_sweep_plan(
            m, None, has_neumann=False, has_dirichlet=False,
            robin_const=rob_c, pad_to_tile=True))(mask)
        T = jax.jit(pad_domain)(T)

        @functools.partial(jax.jit, donate_argnums=0)
        def step(T, plan, dt):
            return adi_step_pallas(T, plan, grid, mat, dt=dt, theta=0.5,
                                   t_inf=20.0)

        probe = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]))
        dt = jnp.float32(0.05)
        T = step(T, plan, dt)
        float(probe(T))      # compile + warm up outside the trace
        with trace(args.logdir):
            for _ in range(args.steps):
                T = step(T, plan, dt)
            float(probe(T))

    rows = op_breakdown(args.logdir)
    if rows:
        total = sum(v for _, v in rows)
        print(f"[trace] device op self-time over {args.steps} steps "
              f"(total {total / 1e3:.2f} ms):")
        for name, us in rows[:25]:
            print(f"  {us / 1e3:9.3f} ms  {100 * us / total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
