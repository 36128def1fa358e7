#!/bin/bash
# Round-4 flagship phase, session-3 continuation. Session-2 ran the
# byt5-geometry pretrain to step 9300 but its loss curve shows the constant
# lr=1e-3 is too hot at ~300M params (loss 1.58 @500 spiked to 1.95 at the
# warmup peak and only crawled back to 1.76 by 9300; the d256 geometry
# tolerated the same schedule). This resumes from the step-9300 checkpoint
# with lr dropped to 3e-4 and a bounded budget, then re-runs the reference
# MSE fine-tune from the refreshed export with a longer step budget (the
# previous fine-tune stopped at 3k steps — the d256 runs take off between
# 2k and 5k).
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
  timeout 12000 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

run pretrain_byt5_resume python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 16 \
  --model.lr 3e-4 \
  --trainer.max_steps 30000 --trainer.val_interval 3000 \
  --trainer.time_limit_s "${FLAGSHIP_BUDGET_S:-5200}" \
  --trainer.ckpt_dir /tmp/pretrain_byt5_ckpt --trainer.resume true \
  --export_dir "$EXPORT"

run flagship_finetune2 python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 6000 --eval-every 2000

echo "=== $(date +%H:%M:%S) FLAGSHIP PHASE 3 COMPLETE" >&2
