#!/bin/bash
# Round-5 master queue, take 5 — the MSE grid at byt5 geometry is now
# measured-closed (three inits x two schedules, all fail):
#   - any span-corruption init x MSE: parks at the all-zeros floor
#     (off-diag cos ~0.999 kills the gradient's similarity spread);
#   - random init x lr 3e-4: post-warmup divergence (loss climbs,
#     eff-rank 24 -> 2, R@10 35.75 -> 0.2);
#   - random init x lr 1e-4 (reference schedule): stable loss, eval
#     IMPROVES through warmup (R@10 36.4, R@1 17.1, eff-rank 71 at step
#     2000) then ERODES once lr reaches 1e-4 (R@10 15.9 at 4000) —
#     r5_ft_byt5_random_lr1e4.json.
# d256 x MSE trains to R@1 80 on the same data; ~300M x MSE does not
# survive any tried schedule. The framework's documented alternative loss
# (`--model.loss infonce`, retrieval/main.py) is the remaining flagship
# path: softmax ranking is shift-invariant and scale-robust, immune to
# the uniform-shrink degenerate optimum.
#
#  A3  ft_byt5_random_infonce — ask #1, flagship at reference geometry
#  B   abl_trained_attr       — ask #2 part 1 (+ saved models)
#  C   intervention reruns    — ask #2 part 2 (instant replay)
#  P2  env-latency realism    — ask #7
#  P1  7B int4 streaming service — ask #3
#  D'  ft(9k) InfoNCE — does span-corruption pretraining help under the
#      loss that can use it? (final scaling-study link)
#  P3  reorder crossover sweep — ask #5
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
echo $$ > /tmp/r5_master5.pid

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout "$tmo" "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

wait_tunnel() {
  while true; do
    if timeout 240 python benchmarks/tunnel_probe.py --iters 2 \
         > /tmp/r5_tunnel_check.json 2>/dev/null; then
      echo "=== $(date +%H:%M:%S) tunnel healthy: $(cat /tmp/r5_tunnel_check.json)" >&2
      return 0
    fi
    echo "=== $(date +%H:%M:%S) tunnel still down; retry in 120s" >&2
    sleep 120
  done
}

# A3 — flagship: random init x InfoNCE x reference schedule
wait_tunnel
run ft_byt5_random_infonce 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --loss infonce --lr 1e-4 --warmup 2000 --skip-step0-eval

# B — hard-benchmark chain at d256 with failure attribution + saved models
wait_tunnel
run abl_trained_attr 11000 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --init-hf /tmp/pretrain_d256_hard_export \
  --retr-steps 6000 --eval-every 2000 --gen-steps 6000 --save-models

# C — attribution-driven prover intervention reruns (instant replay)
if [ -f "$ROOT/retriever_params.pkl" ]; then
  wait_tunnel
  run attr_exp24 3600 python benchmarks/synthetic_reference_scale.py \
    --hard --root "$ROOT" --from-saved --prover-expansions 24
  run attr_beams16 3600 python benchmarks/synthetic_reference_scale.py \
    --hard --root "$ROOT" --from-saved --prover-beams 16
  run attr_exp24_beams16 3600 python benchmarks/synthetic_reference_scale.py \
    --hard --root "$ROOT" --from-saved --prover-expansions 24 --prover-beams 16
else
  echo "=== no saved models under $ROOT — skipping interventions" >&2
fi

# P2 — env-latency realism: 2 s scripted run_tac waits, streaming cells
wait_tunnel
run service_envlat2s 7200 python benchmarks/service_load.py \
  --quick --streaming-only --env-latency 2.0

# P1 — 7B int4 through the full streaming service under search load
wait_tunnel
run service_7b_int4 9000 python benchmarks/service_load.py \
  --llama7b --bits 4 --num-theorems 24

# D' — InfoNCE fine-tune from the step-9k export (pretrain-utility cell)
wait_tunnel
run ft_byt5c_step9k_infonce 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 --init-hf /tmp/byt5c_step9k_export \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --loss infonce --lr 1e-4 --warmup 2000 --skip-step0-eval

# P3 — einsum-vs-scan reorder crossover sweep
wait_tunnel
bash benchmarks/round5_reorder_sweep.sh

echo "=== $(date +%H:%M:%S) MASTER5 COMPLETE" >&2
