#!/bin/bash
# Round-4 watchdog #2: the axon relay died a third time this round
# (~07:39, mid-pretrain-continuation — the run hung on a device fetch and
# was killed; solo probes time out). Probe every 2 min until the tunnel
# returns, then run the short high-certainty measurements first (queue5:
# scan-reorder microbench at the small-cache shapes that ground
# AUTO_SCAN_CACHE_BYTES, the auto-default 7B confirmation, bench.py cache
# warm), then the flagship pretrain continuation with whatever wall-clock
# remains before the end-of-round driver bench.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
LOG="$R/r4_watchdog2.log"
echo $$ > /tmp/watchdog2.pid
DEADLINE=$(date -d "11:02" +%s)

probe() {
  timeout 240 python - <<'EOF' > /dev/null 2>&1
import numpy as np, jax.numpy as jnp
x = jnp.ones((4, 4))
np.asarray(x[:1, :1])
EOF
}

while :; do
  now=$(date +%s); left=$((DEADLINE - now))
  if (( left < 600 )); then
    echo "$(date +%H:%M:%S) gave up — tunnel never returned (left=$left)" >> "$LOG"
    exit 1
  fi
  if probe; then break; fi
  echo "$(date +%H:%M:%S) tunnel down (left=$left)" >> "$LOG"
  sleep 120
done
now=$(date +%s); left=$((DEADLINE - now))
echo "$(date +%H:%M:%S) tunnel UP (left=$left) — queue5 first" >> "$LOG"

bash benchmarks/round4_queue5.sh >> "$R/r4_queue5_driver2.log" 2>&1
echo "$(date +%H:%M:%S) queue5 done" >> "$LOG"

now=$(date +%s); left=$((DEADLINE - now))
pb=$((left - 3000))  # keep ~2700s for the fine-tune + slack
if (( pb >= 900 )); then
  echo "$(date +%H:%M:%S) flagship chain, pretrain budget ${pb}s" >> "$LOG"
  FLAGSHIP_BUDGET_S=$pb bash benchmarks/round4_flagship4.sh \
    >> "$R/r4_flagship4_driver2.log" 2>&1
  echo "$(date +%H:%M:%S) flagship chain done" >> "$LOG"
else
  echo "$(date +%H:%M:%S) no time left for the flagship chain (left=$left)" >> "$LOG"
fi
echo "$(date +%H:%M:%S) watchdog2 complete" >> "$LOG"
