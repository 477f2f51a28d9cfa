#!/bin/bash
# Healthy-window follow-up chain (run manually after r4_gates succeeds):
#   1. vp2_chip.py      — re-gate the cyl vp2 A/B with the pipelined r leg
#                         + the prebuilt code plan (bench parity)
#   2. vp2_tune.py      — leg-level timing + tile/chunk sweep
#   3. bench.py         — full driver-format record set
# Logs to /tmp/r4_followup/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4_followup
timeout 900 python scripts/vp2_chip.py   2>&1 | tee /tmp/r4_followup/vp2_chip.log
timeout 900 python scripts/vp2_tune.py   2>&1 | tee /tmp/r4_followup/vp2_tune.log
timeout 1800 python bench.py             2>&1 | tee /tmp/r4_followup/bench.log
echo DONE
