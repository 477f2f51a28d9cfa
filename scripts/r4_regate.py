"""Focused re-run of the round-4 gate timing legs that landed in the
degraded patch of the 2026-08-20 window (parity already passed there):

  - Cartesian varprop 384^3 classic vs vp2-z slope A/B
  - 512^3 / 576^3 scaling with the winner
  - bf16 natural-z parity + 512^3 A/B (gate_bf16 never ran: the service
    threw FAILED_PRECONDITION first)

Usage: python scripts/r4_regate.py [--skip-bf16] [--skip-scale]
"""
import sys

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")

import r4_gates as g

if __name__ == "__main__":
    import jax
    print(f"[r4 regate] {jax.devices()}", flush=True)
    # DEGRADED also covers elevated steady-state exec time, which slope
    # timing does NOT exclude — abort unless forced (ADVICE r4).
    if not g.probe() and "--force" not in sys.argv:
        print("[r4 regate] DEGRADED window — aborting (use --force to "
              "override)", flush=True)
        sys.exit(2)
    for name, y, z in (("classic", False, False), ("vp2-z", False, True)):
        ms = g.vp_case(384, y, z)
        print(f"[cart varprop 384^3 {name}] {ms:.2f} ms/step = "
              f"{384**3/ms/1e6:.2f} Gcell/s", flush=True)
    if "--skip-scale" not in sys.argv:
        for m in (512, 576):
            ms = g.vp_case(m, False, True, steps=12)
            print(f"[cart varprop {m}^3 vp2-z] {ms:.2f} ms/step = "
                  f"{m**3/ms/1e6:.2f} Gcell/s", flush=True)
    if "--skip-bf16" not in sys.argv:
        g.gate_bf16()
