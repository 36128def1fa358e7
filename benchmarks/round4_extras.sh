#!/bin/bash
# Round-4 phase 5 (post-flagship extras):
#   1. tunnel latency probe — context for any serving e/s numbers
#   2. serving e/s re-measure on the now-default einsum reorder (both
#      engine families) — comparable to round 3 ONLY if the probe shows a
#      healthy (~40-100 ms) dispatch floor
#   3. retriever-quality mid point for the hard-benchmark ablation table
#      (retr-steps 1000: between random's Pass@1 0.0 and 6k-steps' 0.435)
#   4. headline bench sanity run
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p benchmarks/results
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
EXPORT=/tmp/pretrain_d256_hard_export

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 7200 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

run tunnel_probe python benchmarks/tunnel_probe.py
run service_t5_einsum python benchmarks/service_load.py --streaming-only --quick
run service_causal_einsum python benchmarks/service_load.py --causal --streaming-only --quick
run abl_midq python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" \
    --retr-steps 1000 --eval-every 1000 --gen-steps 6000
run tunnel_probe2 python benchmarks/tunnel_probe.py
run bench_headline python bench.py

echo "=== $(date +%H:%M:%S) EXTRAS COMPLETE" >&2
