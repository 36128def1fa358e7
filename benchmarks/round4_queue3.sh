#!/bin/bash
# Round-4 phase 3: validate the einsum-reorder switch in-engine, then the
# serving e/s numbers, then chain straight into the quality phase.
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
run engine_bisect_einsum python benchmarks/causal_engine_bisect.py
run service_t5 python benchmarks/service_load.py --streaming-only --quick
run service_causal python benchmarks/service_load.py --causal --streaming-only --quick
bash benchmarks/round4_quality.sh
