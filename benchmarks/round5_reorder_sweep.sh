#!/bin/bash
# Sweep the einsum-vs-scan reorder crossover at intermediate KV-cache sizes
# (VERDICT round-5 ask #5: AUTO_SCAN_CACHE_BYTES = 1 GiB was calibrated by
# two points — byt5-tiny einsum-wins and 7B-int4/2.1 GiB scan-wins).
# Dec-cache bytes = 2(k+v) * layers * S * K * H * T * D * 2B:
#   1p5b S=8  ~0.35 GiB | 7b S=1 ~0.54 GiB | 7b S=2 ~1.08 GiB
# Each point runs both modes back to back (same compile session).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
echo $$ > /tmp/r5_reorder.pid

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 4000 "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

for mode in einsum scan; do
  run "reorder_1p5b_s8_${mode}" python benchmarks/causal7b_serve.py \
    --geometry 1p5b --slots 8 --beams 8 --reorder-mode "$mode" --iters 32
  run "reorder_7b_s1_${mode}" python benchmarks/causal7b_serve.py \
    --geometry 7b --bits 8 --slots 1 --beams 8 --reorder-mode "$mode" --iters 32
  run "reorder_7b_s2_${mode}" python benchmarks/causal7b_serve.py \
    --geometry 7b --bits 8 --slots 2 --beams 8 --reorder-mode "$mode" --iters 32
done
echo "=== $(date +%H:%M:%S) REORDER SWEEP COMPLETE" >&2
