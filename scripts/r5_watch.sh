#!/bin/bash
# Round-5 recovery watcher: probe the remote TPU service every few
# minutes; on the first HEALTHY probe run the REMAINING round-5 backlog
# (updated 2026-08-21 01:40 after the 00:38 window: bf16-varprop gates
# DECIDED (nat-z refuted, g-streams kept); 512^3 f32 / varprop 384 /
# corrected 384 bench rows recorded; the service FAILED_PRECONDITION'd
# through the rest):
#   1. r4_gates.gate_bf16      — const-prop bf16 natural-z A/B at 512^3
#                                (413 closure bug fixed; still undecided)
#   2. varprop_breakdown.py    — leg map for the flagship varprop step
#   3. r5_cyl_be.py --trace    — name the plain-cyl-BE missing ~2.8 ms;
#                                phi-nat + r-tile A/Bs
#   4. vp2_tune.py             — leg tile sweep (args-fix applied)
#   5. bench.py                — the cases the dead service zeroed
# Logs to /tmp/r5w/.  Exits 0 after the chain, non-zero on give-up.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5w
MAX_TRIES=${MAX_TRIES:-70}
for i in $(seq 1 "$MAX_TRIES"); do
    echo "[watch] probe $i/$MAX_TRIES $(date -u +%H:%M:%S)" | tee -a /tmp/r5w/watch.log
    timeout 240 python - <<'EOF' >> /tmp/r5w/watch.log 2>&1
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
# EXEC health is what validates slope timing; slow compiles only cost
# setup wall-clock (the 01:20 bench recorded 2% spreads under a 38 s
# compile probe).  Gate on exec < 35 ms with compile merely bounded.
ok = el < 120 and ex < 0.035
print(f"[probe] compile {el:.1f} s, exec {ex*1e3:.1f} ms "
      f"({'USABLE' if ok else 'DEGRADED'})", flush=True)
raise SystemExit(0 if ok else 1)
EOF
    if [ $? -eq 0 ]; then
        echo "[watch] USABLE (exec-clean) — running the remaining round-5 backlog" \
            | tee -a /tmp/r5w/watch.log
        timeout 900 python -c "
import sys; sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
import r4_gates as g
g.gate_bf16()" 2>&1 | tee /tmp/r5w/bf16_const2.log
        timeout 1800 python scripts/varprop_breakdown.py 2>&1 \
            | tee /tmp/r5w/vp_legs2.log
        timeout 1800 python scripts/r5_cyl_be.py --trace --force 2>&1 \
            | tee /tmp/r5w/cyl_be2.log
        timeout 1500 python scripts/vp2_tune.py 2>&1 | tee /tmp/r5w/vp2_tune2.log
        timeout 3600 python bench.py 2>&1 | tee /tmp/r5w/bench2.log
        echo "[watch] DONE" | tee -a /tmp/r5w/watch.log
        exit 0
    fi
    sleep 120
done
echo "[watch] gave up after $MAX_TRIES probes" | tee -a /tmp/r5w/watch.log
exit 1
