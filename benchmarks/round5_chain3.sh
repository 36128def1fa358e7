#!/bin/bash
# Round-5 chain 3: the attribution deliverable (VERDICT ask #2) first,
# then the byt5 pretrain continuation with whatever budget remains.
#  C1  d256 pretrain on the hard corpus (the round-4 init was lost to the
#      container restart; ~15 min at bs 32).
#  C2  d256 hard chain with --save-models: retriever 6k -> predict ->
#      RAG generator 6k -> prover Pass@1 -> gold-path ATTRIBUTION table.
#      Saved params make intervention reruns prover-only (--from-saved).
#  C3  byt5 span-corruption pretrain continuation (persistence fixed).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
D256_EXPORT=/tmp/pretrain_d256_hard_export
EXPORT=/tmp/pretrain_byt5_export
echo $$ > /tmp/r5_chain3.pid

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 11000 "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# wait for the infonce probe (orphaned from chain 2) to release the chip
while grep -lq "synthetic_reference_scale" /proc/[0-9]*/cmdline 2>/dev/null; do
  sleep 30
done

if [ ! -d "$D256_EXPORT" ]; then
  run pretrain_d256 python -m reprover_tpu.training.pretrain fit \
    --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 32 \
    --model.d_model 256 --model.d_kv 32 --model.d_ff 1024 \
    --model.num_heads 8 --model.num_encoder_layers 4 \
    --model.num_decoder_layers 4 \
    --trainer.max_steps 20000 --trainer.val_interval 4000 \
    --export_dir "$D256_EXPORT"
fi

run abl_trained_attr python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --init-hf "$D256_EXPORT" \
  --retr-steps 6000 --eval-every 2000 --gen-steps 6000 --save-models

rm -rf /tmp/pretrain_byt5_ckpt/50800.orbax-checkpoint-tmp
run pretrain_byt5_r5 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 16 \
  --model.lr 3e-4 \
  --trainer.max_steps 70000 --trainer.val_interval 3000 \
  --trainer.time_limit_s "${PRETRAIN_BUDGET_S:-5400}" \
  --trainer.ckpt_dir /tmp/pretrain_byt5_ckpt --trainer.resume true \
  --export_dir "$EXPORT"

echo "=== $(date +%H:%M:%S) CHAIN 3 COMPLETE" >&2
