#!/bin/bash
# Round-5 attribution-driven intervention reruns (VERDICT ask #2, part 2):
# after the hard-benchmark chain saved its trained models + predictions
# (--save-models), rerun the PROVER stage alone under widened search
# budgets. With the instant-replay environment each rerun is minutes, so
# bracket the two knobs the attribution buckets can indict:
#   search_budget  -> more expansions
#   generator_rank -> more beams
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
echo $$ > /tmp/r5_attrfix.pid

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout "$tmo" "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# wait for queue 2 (which ends with the --save-models chain)
if [ -f /tmp/r5_queue2.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue2.pid)" 2>/dev/null; do sleep 60; done
fi

if [ ! -f "$ROOT/retriever_params.pkl" ]; then
  echo "no saved models found under $ROOT — skipping interventions" >&2
  exit 0
fi

run attr_exp24 3600 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --from-saved --prover-expansions 24

run attr_beams16 3600 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --from-saved --prover-beams 16

run attr_exp24_beams16 3600 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --from-saved --prover-expansions 24 --prover-beams 16

echo "=== $(date +%H:%M:%S) ATTR INTERVENTIONS COMPLETE" >&2
