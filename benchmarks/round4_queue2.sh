#!/bin/bash
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
run 7b_int8 python benchmarks/causal7b_serve.py
run engine_bisect python benchmarks/causal_engine_bisect.py
run reorder_causal python benchmarks/reorder_microbench.py --T 128 --fill 64
run reorder_t5 python benchmarks/reorder_microbench.py --L 4 --H 6 --T 128 --fill 64
echo "=== $(date +%H:%M:%S) QUEUE2 COMPLETE" >&2
