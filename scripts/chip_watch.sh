#!/bin/bash
# Degraded-window watcher: probe the remote TPU compile service every few
# minutes; on the first HEALTHY probe run the pending round-4 chip gates
# (scripts/r4_gates.py) and the follow-up chain (scripts/r4_followup.sh).
# Logs to /tmp/r4w/.  Bounded: gives up after MAX_TRIES probes.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4w
MAX_TRIES=${MAX_TRIES:-40}
for i in $(seq 1 "$MAX_TRIES"); do
    echo "[watch] probe $i/$MAX_TRIES $(date -u +%H:%M:%S)" | tee -a /tmp/r4w/watch.log
    timeout 300 python - <<'EOF' >> /tmp/r4w/watch.log 2>&1
import time, jax, jax.numpy as jnp
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
raise SystemExit(0 if ok else 1)
EOF
    if [ $? -eq 0 ]; then
        echo "[watch] HEALTHY — running r4 gates" | tee -a /tmp/r4w/watch.log
        timeout 1800 python scripts/r4_gates.py 2>&1 | tee /tmp/r4w/gates.log
        gates_rc=${PIPESTATUS[0]}
        if [ "$gates_rc" -ne 0 ]; then
            echo "[watch] gates FAILED (rc=$gates_rc) — skipping follow-up" \
                | tee -a /tmp/r4w/watch.log
            exit "$gates_rc"
        fi
        timeout 1200 python scripts/r5_cyl_be.py --trace 2>&1 \
            | tee /tmp/r4w/cyl_be.log
        bash scripts/r4_followup.sh 2>&1 | tee /tmp/r4w/followup.log
        echo "[watch] DONE" | tee -a /tmp/r4w/watch.log
        exit 0
    fi
    sleep 180
done
echo "[watch] gave up after $MAX_TRIES probes" | tee -a /tmp/r4w/watch.log
exit 1
