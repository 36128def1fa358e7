#!/bin/bash
# Round-4 flagship phase, session-2 rerun (VERDICT round-3 ask #5): the
# previous session scripted this chain but the container restarted before the
# byt5-geometry pretrain ran (/tmp wiped; the 7B + train-step re-measures at
# the top of round4_flagship.sh DID land and are in BASELINE.md). This version
# assumes the hard dataset already exists and budgets the pretrain so the
# export + fine-tune still fit inside one ~4 h session.
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
  timeout 12000 "$@" > "$R/r4_${name}.json" 2> "$R/r4_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# time_limit_s stops fit() gracefully (export still runs) well before the
# external timeout would kill the process and drop the whole run.
# ckpt_dir + resume: a container restart already cost one full run of this
# chain; with these, a rerun resumes from the last val_interval checkpoint
# instead of starting over.
run pretrain_byt5 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size "$BS" \
  --trainer.max_steps "$STEPS" --trainer.val_interval 3000 \
  --trainer.time_limit_s "${FLAGSHIP_BUDGET_S:-7500}" \
  --trainer.ckpt_dir /tmp/pretrain_byt5_ckpt --trainer.resume true \
  --export_dir "$EXPORT"

run flagship_finetune python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 3000 --eval-every 1500

echo "=== $(date +%H:%M:%S) FLAGSHIP PHASE COMPLETE" >&2
