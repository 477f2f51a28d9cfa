"""Varprop scaling record (VERDICT r3 #7): 512^3 and a hostile 576^3-class
shape, slope-timed through the engine exactly like bench --case varprop.
Records Gcell/s and the adaptive block_b2 tile the sweep wrappers pick.

Run on the real chip: python scripts/varprop_scale_chip.py [n ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import bench


def main():
    ns = [int(a) for a in sys.argv[1:]] or [512, 576]
    bench.probe_compile_service()
    for n in ns:
        try:
            value, per_step = bench.run_varprop(n, steps=16)
            gb = value * bench.VARPROP_B_PER_CELL / 1e9
            print(f"[varprop-scale] {n}^3: {per_step * 1e3:.2f} ms/step = "
                  f"{value / 1e9:.3f} Gcell/s "
                  f"({gb:.0f} GB/s apparent of 819, "
                  f"{value / (819e9 / bench.VARPROP_B_PER_CELL) * 100:.0f}% "
                  f"of the {bench.VARPROP_B_PER_CELL:.0f} B model)",
                  flush=True)
        except Exception as e:
            print(f"[varprop-scale] {n}^3 FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
