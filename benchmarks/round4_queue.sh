#!/bin/bash
# Round-4 real-TPU measurement queue (VERDICT round-3 asks #1 and #2).
# Sequential: one chip, compiles take minutes each through the tunnel.
# Results land in benchmarks/results/r4_*.json; progress in the log.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p benchmarks/results
R=benchmarks/results

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 3600 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# --- VERDICT #1: queued wall-clock measurements ---------------------------
# 7B-geometry int8 decode (the one-chip deployment claim)
run 7b_int8 python benchmarks/causal7b_serve.py
# int8-vs-bf16 ratio at a geometry where both fit
run 1p5b_cmp python benchmarks/causal7b_serve.py --geometry 1p5b --compare-bf16

# --- VERDICT #2: training MFU levers at L=2304 -----------------------------
# kernel-level sweep: forced block_q + KV-blocked variant, B=8 (train shape)
run bisect2304 python benchmarks/flash_kernel_bisect.py --batch 8 --seq 2304 \
    --sweep-block-q 256,384,576,768 --block-kv 512
# step-level: baseline re-measure, then the candidate routes
run genstep_base python benchmarks/genstep_profile.py --policy lite
run genstep_bkv512 python benchmarks/genstep_profile.py --policy lite --flash-block-kv 512
run genstep_bq384 python benchmarks/genstep_profile.py --policy lite --flash-block-q 384
run genstep_bq576 python benchmarks/genstep_profile.py --policy lite --flash-block-q 576

# --- VERDICT #1 cont.: long-context wall-clock ------------------------------
run longctx python benchmarks/longcontext_wallclock.py --lens 8192,16384
# 8k-input generation train step, bs 4 (AOT: 3.35 + 12.96 GB — donated step only)
run genstep_8k python benchmarks/genstep_profile.py --policy lite --batch 4 \
    --inp 8192 --out 512 --step-only

echo "=== $(date +%H:%M:%S) QUEUE COMPLETE" >&2
