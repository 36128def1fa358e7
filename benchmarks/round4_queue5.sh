#!/bin/bash
# Round-4 follow-on queue #5: waits for the flagship4 driver to release
# the chip, then (a) grounds the reorder_mode="auto" threshold's
# small-cache side — the scan variant in reorder_microbench at the two
# in-engine shapes the einsum numbers came from; (b) confirms the new
# "auto" default resolves to scan at 7B geometry with matching wall-clock;
# (c) warms the compilation cache for the driver's end-of-round bench.py.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
mkdir -p "$R"

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "=== waiting for pid $WAIT_PID (flagship4 driver) ===" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 2400 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# (a) causal-bisect shape [8,8,64,8,128,64] — einsum measured 7.16 ms here
run reorder_scan_causal python benchmarks/reorder_microbench.py \
  --iters 32 --reps 3
# T5 engine shape (byt5-small: 4 decoder layers, d_kv 64, 6 heads)
run reorder_scan_t5 python benchmarks/reorder_microbench.py \
  --iters 32 --reps 3 --L 4 --H 6 --D 64

# (b) auto default at 7B int4: must match the explicit-scan 99.4 ms/step
run serve7b_int4_auto python benchmarks/causal7b_serve.py \
  --geometry 7b --bits 4 --slots 4 --beams 8 --iters 16 --reps 3

# (c) warm the cache for the end-of-round driver bench
timeout 1200 python bench.py > "$R/r4_bench_warm.json" 2> "$R/r4_bench_warm.err"

echo "=== $(date +%H:%M:%S) QUEUE5 COMPLETE" >&2
