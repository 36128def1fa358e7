#!/bin/bash
# Round-4 follow-on queue: waits for the flagship pretrain+finetune driver
# to release the chip, then measures the 13B int4 serving loop with the
# layer-blocked scan reorder. The einsum-reorder loop OOM'd at runtime at
# 4 slots x 8 beams (17.44 > 15.75 GB: two full-cache while-carry copies);
# the scan reorder keeps the carry single-copy and the AOT gate
# (causal13b_int4_serve_loop_scan) shows no extra copies — this run turns
# that into measured tokens/s for the one-chip 13B claim at full geometry.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
mkdir -p "$R"

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "=== waiting for pid $WAIT_PID (flagship driver) ===" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 4000 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# The headline measurement: 13B int4, the AOT-gated 4x8 geometry, scan.
run serve13b_int4_scan python benchmarks/causal7b_serve.py \
  --geometry 13b --bits 4 --reorder-mode scan --slots 4 --beams 8 \
  --iters 16 --reps 3

# Control: does the scan reorder cost anything where einsum also fits?
# 7B int4 einsum measured 109.8 ms/step — same geometry, scan.
run serve7b_int4_scan python benchmarks/causal7b_serve.py \
  --geometry 7b --bits 4 --reorder-mode scan --slots 4 --beams 8 \
  --iters 16 --reps 3

echo "=== $(date +%H:%M:%S) QUEUE13B COMPLETE" >&2
