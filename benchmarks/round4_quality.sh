#!/bin/bash
# Round-4 quality phase (VERDICT round-3 ask #4): d256 pretrain on the HARD
# corpus, then the RAG ablation table {trained, oracle, none, random} on the
# un-saturated benchmark. Sequential — one chip.
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

# hard dataset (CPU; reused by every run below)
if [ ! -f "$ROOT/data/corpus.jsonl" ]; then
  python scripts/make_synthetic_benchmark.py \
    --out "$ROOT/data" --num-files 3000 --premises-per-file 43 \
    --num-theorems 20000 --max-steps 5 --min-accessible 200 --hard \
    > "$R/r4_hard_data.log" 2>&1
fi

# d256 span-corruption pretrain on the hard corpus (round-3 recipe)
if [ ! -d "$EXPORT" ]; then
  run pretrain_d256 python -m reprover_tpu.training.pretrain fit \
    --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 32 \
    --model.d_model 256 --model.d_kv 32 --model.d_ff 1024 \
    --model.num_heads 8 --model.num_encoder_layers 4 \
    --model.num_decoder_layers 4 \
    --trainer.max_steps 20000 --trainer.val_interval 4000 \
    --export_dir "$EXPORT"
fi

# ablation table on the hard benchmark, all from the pretrained init
run abl_trained python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" \
    --retr-steps 6000 --eval-every 2000 --gen-steps 6000
run abl_oracle python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" --rag oracle --gen-steps 6000
run abl_none python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" --rag none --gen-steps 6000
run abl_random python benchmarks/synthetic_reference_scale.py --hard \
    --root "$ROOT" --init-hf "$EXPORT" --rag random --gen-steps 6000

echo "=== $(date +%H:%M:%S) QUALITY PHASE COMPLETE" >&2
