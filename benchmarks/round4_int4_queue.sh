#!/bin/bash
# Round-4 int4 wall-clock queue: waits for the flagship chain + headline
# bench (round4_watchdog.sh) to free the chip, then measures the new w4a16
# serving path on the real TPU — 7B int4 first (int4-vs-int8 ratio against
# the recorded 158.1 ms/step int8 row), then the 13B-on-one-chip headline
# if time remains. Stops waiting if the watchdog never finishes.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
LOG="$R/r4_int4_queue.log"

for i in $(seq 1 90); do
  if [ -f "$R/r4_bench_headline.json" ]; then
    echo "$(date +%H:%M:%S) chip free (wait $i) — running int4 benches" >> "$LOG"
    timeout 2400 python benchmarks/causal7b_serve.py --bits 4 \
      > "$R/r4_7b_int4.json" 2> "$R/r4_7b_int4.err"
    echo "$(date +%H:%M:%S) 7b int4 rc=$?" >> "$LOG"
    timeout 2400 python benchmarks/causal7b_serve.py --geometry 13b --bits 4 \
      > "$R/r4_13b_int4.json" 2> "$R/r4_13b_int4.err"
    echo "$(date +%H:%M:%S) 13b int4 rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 60
done
echo "$(date +%H:%M:%S) gave up waiting for the chip" >> "$LOG"
