#!/bin/bash
# Round-4 flagship phase, session-4 continuation. Session-3 took the
# byt5-geometry pretrain to 29,700 steps (val denoising loss 1.34, still
# descending ~0.02/1k steps at lr 3e-4) and re-ran the fine-tune: R@10 0.45
# at 6k steps vs the d256-hard init's 99.97. Diagnosis: the ~300M init is
# undertrained — its step-0 retrieval eval (R@100 2.39) is 6x below the
# d256-hard init's (14.7), and the fine-tune loss converges while recall
# crawls, i.e. the encoder features aren't there yet. This continues the
# same checkpoint with a bounded wall-clock budget, then re-runs the
# fine-tune from the refreshed export. Checkpoint+resume means round 5 can
# keep extending the curve if the budget truncates it again.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p benchmarks/results
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
EXPORT=/tmp/pretrain_byt5_export

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 11000 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

run pretrain_byt5_resume2 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 16 \
  --model.lr 3e-4 \
  --trainer.max_steps 70000 --trainer.val_interval 3000 \
  --trainer.time_limit_s "${FLAGSHIP_BUDGET_S:-8100}" \
  --trainer.ckpt_dir /tmp/pretrain_byt5_ckpt --trainer.resume true \
  --export_dir "$EXPORT"

run flagship_finetune3 python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 6000 --eval-every 2000

echo "=== $(date +%H:%M:%S) FLAGSHIP PHASE 4 COMPLETE" >&2
