#!/bin/bash
# Round-4 flagship phase (VERDICT round-3 ask #5): span-corruption pretrain
# at FULL byt5-small geometry (~300M) on the hard corpus, HF export, then a
# bounded reference-recipe retriever fine-tune from that init. Plus the 7B
# int8 decode re-measure on the einsum reorder.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p benchmarks/results
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
EXPORT=/tmp/pretrain_byt5_export
BS="${FLAGSHIP_BS:-16}"
STEPS="${FLAGSHIP_STEPS:-18000}"

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 21600 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

run 7b_int8_einsum python benchmarks/causal7b_serve.py

# retrieval + generation train steps at reference configs, healthy-tunnel
# re-measure (round-3 rows were taken in the degraded window)
run train_steps python benchmarks/train_step_flash.py

# time_limit_s stops fit() gracefully (export still runs) well before the
# external timeout would kill the process and drop the whole run.
run pretrain_byt5 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size "$BS" \
  --trainer.max_steps "$STEPS" --trainer.val_interval 3000 \
  --trainer.time_limit_s "${FLAGSHIP_BUDGET_S:-12000}" \
  --export_dir "$EXPORT"

run flagship_finetune python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 3000 --eval-every 1500

echo "=== $(date +%H:%M:%S) FLAGSHIP PHASE COMPLETE" >&2
