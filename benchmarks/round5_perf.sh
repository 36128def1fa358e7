#!/bin/bash
# Round-5 perf chip queue — runs after round5_main.sh releases the chip.
#  P1  7B int4 through the FULL streaming service under 16-worker search
#      load (VERDICT ask #3: the step-loop bench never met the admission
#      coalescer; reference anchor proof_search.py:332-366 AsyncLLMEngine).
#  P2  env-latency realism (ask #7): scripted 2 s run_tac waits, 16 workers,
#      streaming service — measures whether continuous batching absorbs
#      Lean-bound idle gaps (compare vs the instant-replay cells).
#  P3  einsum-vs-scan reorder crossover sweep at 0.35/0.54/1.08 GiB
#      dec-cache cells (ask #5: AUTO_SCAN_CACHE_BYTES calibration).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
echo $$ > /tmp/r5_perf.pid

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout "$tmo" "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# wait for the attribution-intervention stage to release the chip
while [ ! -f /tmp/r5_attrfix.pid ]; do sleep 60; done
while kill -0 "$(cat /tmp/r5_attrfix.pid)" 2>/dev/null; do sleep 60; done

# P2 first (cheap: compiles cached from the round-4 service rows) —
# latency realism at the default service geometry: 2 s scripted env waits,
# 16 workers, streaming cells; compare vs the instant-replay rows.
run service_envlat2s 7200 python benchmarks/service_load.py \
  --quick --streaming-only --env-latency 2.0

# P1 — 7B int4 streaming service under load (two passes inside: the
# second is steady-state; compile-heavy)
run service_7b_int4 9000 python benchmarks/service_load.py \
  --llama7b --bits 4 --num-theorems 24

# P3 — reorder crossover sweep (runs its own cells; see the script)
bash benchmarks/round5_reorder_sweep.sh

echo "=== $(date +%H:%M:%S) ROUND5 PERF COMPLETE" >&2
