#!/bin/bash
# Round-4 tunnel watchdog: the axon relay died mid-session (second outage this
# round) with the flagship chain (VERDICT round-3 ask #5) still queued. Probe
# the tunnel every 2 min; the moment a device fetch succeeds, launch the
# flagship pretrain->fine-tune chain with a budget that fits the remaining
# session, then the extras that are still runnable.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p benchmarks/results
R=benchmarks/results
LOG="$R/r4_watchdog.log"

probe() {
  timeout 240 python - <<'EOF' > /dev/null 2>&1
import numpy as np, jax.numpy as jnp
x = jnp.ones((4, 4))
np.asarray(x[:1, :1])
EOF
}

for i in $(seq 1 60); do
  if probe; then
    echo "$(date +%H:%M:%S) tunnel UP (probe $i) — launching flagship chain" >> "$LOG"
    FLAGSHIP_BUDGET_S="${FLAGSHIP_BUDGET_S:-2400}" FLAGSHIP_BS=16 FLAGSHIP_STEPS=18000 \
      bash benchmarks/round4_flagship2.sh >> "$R/r4_flagship2_driver.log" 2>&1
    echo "$(date +%H:%M:%S) flagship chain done" >> "$LOG"
    timeout 1200 python bench.py > "$R/r4_bench_headline.json" 2> "$R/r4_bench_headline.err"
    echo "$(date +%H:%M:%S) headline bench done" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) tunnel down (probe $i)" >> "$LOG"
  sleep 120
done
echo "$(date +%H:%M:%S) gave up — tunnel never returned" >> "$LOG"
