#!/bin/bash
# Round-5 flagship chain. Diagnosis from round 4's failures:
#  (a) the fine-tune used lr 3e-4 / warmup 200 where the reference
#      fine-tunes byt5-small at lr 1e-4 / warmup 2000
#      (/root/reference/retrieval/confs/cli_lean4_random.yaml:45-47) — a
#      3x-too-hot schedule on a 300M model with an MSE-vs-sparse-label
#      loss (collapse-friendly), the prime suspect for "loss converges,
#      recall stays ~0";
#  (b) the resumed pretrain reached 50.8k steps but its final checkpoint
#      AND export were lost to the Recall@10_val KeyError (config
#      default_factory bug, fixed + tested this round), so every round-4
#      fine-tune actually ran from the same stale 29.7k export.
# Q1 isolates (a) at the existing 29.7k init; Q2 re-extends the pretrain
# with persistence fixed; Q3 re-runs the winning fine-tune config from the
# refreshed export.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
EXPORT=/tmp/pretrain_byt5_export
echo $$ > /tmp/r5_flagship.pid

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 11000 "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# Q1: reference fine-tune hparams at the 29.7k init (control for lr).
run flagship_ft_lr1e4 python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --lr 1e-4 --warmup 2000 --skip-step0-eval

# Q2: extend the pretrain (resume restores the latest COMMITTED step,
# 29700; the round-4 50800 tmp dir is uncommitted and cleaned below).
rm -rf /tmp/pretrain_byt5_ckpt/50800.orbax-checkpoint-tmp
run pretrain_byt5_r5 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 16 \
  --model.lr 3e-4 \
  --trainer.max_steps 70000 --trainer.val_interval 3000 \
  --trainer.time_limit_s "${PRETRAIN_BUDGET_S:-7200}" \
  --trainer.ckpt_dir /tmp/pretrain_byt5_ckpt --trainer.resume true \
  --export_dir "$EXPORT"

# Q3: fine-tune from the refreshed export with the reference hparams.
run flagship_ft_deep python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --lr 1e-4 --warmup 2000 --skip-step0-eval

echo "=== $(date +%H:%M:%S) ROUND-5 FLAGSHIP CHAIN COMPLETE" >&2
