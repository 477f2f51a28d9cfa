#!/bin/bash
# One serialized chip measurement session (run when the compile probe is
# healthy; see NOTES.md environment section).  Round-4 order:
#   1. bench cartesian (512^3 f32)   -> headline with the NATURAL-layout z
#      sweep (transpose pair gone; chip gate scripts/znat_chip.py)
#   2. bench varprop                 -> z-leading stream rebuild A/B
#   3. bench cyl_varprop             -> nat-z + in-kernel phi hi-faces
#   4. bench bf16 / cylindrical / masked -> round-over-round records
#   5. varprop scale records (512^3, 576^3)          [VERDICT r3 #7]
#   6. g-stream keep-or-kill A/B on mask-heavy + bf16 [VERDICT r3 #6]
#   7. capacity 768^3
#   8. profiler trace of the new 512^3 step
# Each stage is timeout-bounded so a degraded window cannot wedge the
# session; partial results are still recorded.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/chip_session.log}
: > "$LOG"
run() {
    echo "=== $* ===" | tee -a "$LOG"
    BENCH_WATCHDOG_S=$(( ${T:-900} - 60 )) timeout "${T:-900}" "$@" >> "$LOG" 2>&1
    echo "--- exit $? ---" | tee -a "$LOG"
}
run python bench.py --case cartesian
run python bench.py --case varprop
run python bench.py --case cyl_varprop
run python bench.py --case bf16
run python bench.py --case cylindrical
run python bench.py --case masked
T=1500 run python scripts/varprop_scale_chip.py 512 576
T=1500 run python scripts/gstream_chip.py --skip_small --mask_heavy
T=1500 run python bench.py --case capacity
T=1200 run python scripts/trace_512.py --logdir /tmp/trace512_r4
tail -5 "$LOG"
echo "session log: $LOG"
