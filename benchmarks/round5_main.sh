#!/bin/bash
# Round-5 main chip queue (serialized; each stage timeout-bounded).
#  M1  byt5 --no-flash MSE fine-tune A/B, 2k steps: if it parks at the same
#      0.0357 all-zeros floor as the flash run (r5_flagship_ft_lr1e4), the
#      Pallas train path is exonerated and the collapse is optimization-
#      at-geometry (VERDICT ask #1 diagnosis).
#  M2  d256 pretrain (round-4 init lost to container restart) + hard chain
#      with --save-models -> Pass@1 + gold-path ATTRIBUTION table
#      (VERDICT ask #2 deliverable).
#  M3  byt5 InfoNCE fine-tune 12k steps from the pretrain export: the
#      no-degenerate-optimum loss given enough budget (ask #1 intervention).
#  M4  d512 span-corruption pretrain 20k + MSE fine-tune 6k: the scaling-
#      study midpoint (d256 works / d512 ? / byt5 collapses).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
D256_EXPORT=/tmp/pretrain_d256_hard_export
D512_EXPORT=/tmp/pretrain_d512_hard_export
BYT5_EXPORT=/tmp/pretrain_byt5_export
echo $$ > /tmp/r5_main.pid

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout "$tmo" "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# wait for the warm bench rerun to release the chip
while grep -lq "bench.py" /proc/[0-9]*/cmdline 2>/dev/null; do sleep 20; done

# M1 — flash-exoneration A/B (short)
run ft_byt5_noflash 3600 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 --init-hf "$BYT5_EXPORT" \
  --no-flash --retriever-only --retr-steps 2000 --eval-every 2000 \
  --lr 1e-4 --warmup 2000 --skip-step0-eval

# M2 — attribution deliverable
if [ ! -d "$D256_EXPORT" ]; then
  run pretrain_d256 3600 python -m reprover_tpu.training.pretrain fit \
    --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 32 \
    --model.d_model 256 --model.d_kv 32 --model.d_ff 1024 \
    --model.num_heads 8 --model.num_encoder_layers 4 \
    --model.num_decoder_layers 4 \
    --trainer.max_steps 20000 --trainer.val_interval 4000 \
    --export_dir "$D256_EXPORT"
fi
run abl_trained_attr 11000 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --init-hf "$D256_EXPORT" \
  --retr-steps 6000 --eval-every 2000 --gen-steps 6000 --save-models

# M3 — byt5 InfoNCE long run
run ft_byt5_infonce12k 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 --init-hf "$BYT5_EXPORT" \
  --retriever-only --retr-steps 12000 --eval-every 3000 \
  --loss infonce --lr 1e-4 --warmup 2000 --skip-step0-eval

# M4 — d512 scaling midpoint
if [ ! -d "$D512_EXPORT" ]; then
  run pretrain_d512 5400 python -m reprover_tpu.training.pretrain fit \
    --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 32 \
    --model.d_model 512 --model.d_kv 64 --model.d_ff 2048 \
    --model.num_heads 8 --model.num_encoder_layers 8 \
    --model.num_decoder_layers 8 \
    --trainer.max_steps 20000 --trainer.val_interval 4000 \
    --export_dir "$D512_EXPORT"
fi
run ft_d512_mse 5400 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry d512 --init-hf "$D512_EXPORT" \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --lr 1e-4 --warmup 2000 --skip-step0-eval

echo "=== $(date +%H:%M:%S) ROUND5 MAIN COMPLETE" >&2
