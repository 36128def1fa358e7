#!/bin/bash
# Round-5 stage 2.5 — fine-tune from the EARLY-STOP pretrain init.
#
# CPU probes of the live byt5c lineage (probe_ckpt_zeroshot.py) measured
# zero-shot retrieval ERODING with pretrain steps (R@10 0.53 @ 9k ->
# 0.50 @ 12k; premise eff-rank 6.17 -> 5.42) while pretrain loss kept
# improving. So the final-export fine-tune (queue2b's gated ft_byt5c_mse)
# may not use the best init this lineage produced. This stage fine-tunes
# from the preserved step-9000 export under identical hparams:
#   - if the queue2b gate FAILED, this is the flagship's only shot;
#   - if it passed, ft(9k) vs ft(final) directly measures whether more
#     span-corruption pretraining helps or hurts the retrieval fine-tune
#     (the missing scaling-study link, VERDICT r4 ask #1).
#
# Splice protocol: launched while queue2b is alive; captures queue2b's pid,
# then REPLACES /tmp/r5_queue2.pid with its own pid so the downstream
# attr_fix stage (which re-reads that file every 60 s) waits for this stage
# too. Chip serialization preserved, no running script modified.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
EXPORT=/tmp/byt5c_step9k_export

PREV_PID=$(cat /tmp/r5_queue2.pid)
echo $$ > /tmp/r5_queue2.pid
echo "=== $(date +%H:%M:%S) stage25 spliced after pid $PREV_PID" >&2

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout "$tmo" "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done

if [ ! -d "$EXPORT" ]; then
  echo "no step-9k export at $EXPORT — nothing to do" >&2
  exit 0
fi

run ft_byt5c_step9k 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 --init-hf "$EXPORT" \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --lr 1e-4 --warmup 2000

echo "=== $(date +%H:%M:%S) STAGE 2.5 COMPLETE" >&2
