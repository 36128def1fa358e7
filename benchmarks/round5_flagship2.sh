#!/bin/bash
# Round-5 flagship chain, part 2. Part 1's lr experiment REFUTED the
# hot-schedule hypothesis: lr 1e-4 / warmup 2000 (the reference's own
# byt5 fine-tune schedule) converges to loss ~0.0357 with R@10 ~0.3 — and
# 0.0357 is exactly the all-zeros-similarity MSE floor (the label matrix
# is ~8/256 ones), i.e. the model finds the orthogonal-embeddings local
# minimum. d256 escapes it because its pretrained init already ranks
# positives (R@100 14.7); the 29.7k-step byt5 init (R@100 2.39) does not.
# The reference never sees this because google/byt5-small is a fully
# pretrained model. Two attacks, both measured here:
#   Q1b  InfoNCE fine-tune from the SAME stale init — contrastive
#        normalization has no zero-solution (relative scores, not
#        absolute targets), so it should converge where MSE cannot.
#   Q2   extend the span-corruption pretrain (persistence fixed this
#        round), then
#   Q3   fine-tune from the refreshed export with BOTH losses — does a
#        deeper init unlock MSE (the parity loss), and how far does
#        InfoNCE move?
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
EXPORT=/tmp/pretrain_byt5_export
echo $$ > /tmp/r5_flagship2.pid

run() {
  name="$1"; shift
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout 11000 "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# wait for part 1's Q1 (orphaned) to release the chip
while ls /proc/*/cmdline >/dev/null 2>&1 && grep -lq synthetic_reference_scale /proc/[0-9]*/cmdline 2>/dev/null; do
  sleep 30
done

run flagship_ft_infonce python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 6000 --eval-every 1000 \
  --loss infonce --lr 1e-4 --warmup 2000 --skip-step0-eval

rm -rf /tmp/pretrain_byt5_ckpt/50800.orbax-checkpoint-tmp
run pretrain_byt5_r5 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 16 \
  --model.lr 3e-4 \
  --trainer.max_steps 70000 --trainer.val_interval 3000 \
  --trainer.time_limit_s "${PRETRAIN_BUDGET_S:-7200}" \
  --trainer.ckpt_dir /tmp/pretrain_byt5_ckpt --trainer.resume true \
  --export_dir "$EXPORT"

run flagship_ft_deep_mse python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 4000 --eval-every 1000 \
  --lr 1e-4 --warmup 2000 --skip-step0-eval

run flagship_ft_deep_infonce python benchmarks/synthetic_reference_scale.py --hard \
  --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 4000 --eval-every 1000 \
  --loss infonce --lr 1e-4 --warmup 2000 --skip-step0-eval

echo "=== $(date +%H:%M:%S) ROUND-5 FLAGSHIP CHAIN 2 COMPLETE" >&2
