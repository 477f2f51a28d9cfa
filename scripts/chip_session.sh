#!/bin/bash
# One serialized chip measurement session (run when the compile probe is
# healthy; see NOTES.md environment section).  Captures, in order:
#   1. bench main (512^3 f32)        -> fresh headline number
#   2. bench bf16                    -> bf16 mode number
#   3. bench varprop                 -> the face-streaming kernels' A/B
#   4. bench cylindrical + masked    -> cylindrical numbers
#   5a. cyl-varprop kernel gate (compile+parity+A/B of the
#      compressed stream kernels, scripts/cyl_vp_chip.py)
#   5. ring-varprop chip gate        -> compile+parity+A/B of the fused
#      theta+x-sweep varprop kernel (flip FUSE_THETA_DEFAULT on a win)
#   6. varprop component breakdown   -> where varprop time goes
#   7. profiler trace of the 512^3 step -> plateau evidence (VERDICT #1)
# Each stage is timeout-bounded so a degraded window cannot wedge the
# session; partial results are still recorded.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/chip_session.log}
: > "$LOG"
run() {
    echo "=== $* ===" | tee -a "$LOG"
    # keep bench's internal watchdog BELOW the outer timeout so a tunnel
    # outage still yields the guaranteed zero JSON line in the log
    BENCH_WATCHDOG_S=$(( ${T:-900} - 60 )) timeout "${T:-900}" "$@" >> "$LOG" 2>&1
    echo "--- exit $? ---" | tee -a "$LOG"
}
run python bench.py
run python bench.py --case bf16
run python bench.py --case varprop
run python bench.py --case cylindrical
run python bench.py --case masked
run python bench.py --case cyl_varprop
T=1500 run python bench.py --case capacity
T=1200 run python scripts/vp_ring_chip.py --n 384
T=1200 run python scripts/cyl_vp_chip.py
T=1200 run python scripts/varprop_breakdown.py --n 384
T=900 run python scripts/opt_chip.py
T=1200 run python scripts/trace_512.py --logdir /tmp/trace512
tail -5 "$LOG"
echo "session log: $LOG"
