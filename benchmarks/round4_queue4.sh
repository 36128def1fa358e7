#!/bin/bash
# Round-4 phase 4: re-run the RAG ablation table with the mark-skew fix
# (search-time augmented states are now mark-free, matching the training
# distribution — see commit "Fix train/search skew"), then chain into the
# flagship phase. The pre-fix runs are kept as r4_abl_{trained,oracle,none}:
# oracle Top-1=1.0 / Pass@1=0.0 is the skew's measurement.
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

run abl_oracle_fixed python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" --rag oracle --gen-steps 6000
run abl_trained_fixed python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" \
    --retr-steps 6000 --eval-every 2000 --gen-steps 6000
run abl_random_fixed python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" --rag random --gen-steps 6000

echo "=== $(date +%H:%M:%S) ABLATIONS DONE — starting flagship phase" >&2
bash benchmarks/round4_flagship.sh
