#!/bin/bash
# Round-5 master queue, take 3 — reordered after the step-9k-init MSE
# fine-tune measurably followed the round-4 collapse pattern (R@10 3.8 vs
# d256's 99.1 at step 2000, loss hugging the 0.0357 all-zeros floor;
# r5_ft_byt5c_step9k.json, killed at step ~2400 to save the chip).
#
# Diversity probes close the loop: EVERY span-corruption checkpoint is too
# anisotropic for the MSE recipe (step-9k export off-diag cos 0.9990 +/-
# 0.0007, step-18k 0.9998 +/- 0.0002, vs random byt5 0.911 +/- 0.027 and
# random d256 0.919 +/- 0.028 — and d256-random trains to R@1 80 via MSE).
# The missing flagship control is therefore the RANDOM-INIT byt5 MSE
# fine-tune: same geometry as the reference's google/byt5-small (~300M),
# best zero-shot geometry of all measured inits (raw R@10 0.84 on the
# 96-pool probe). lr 3e-4 matches the d256 comparison run for an
# equal-steps comparison; warmup 1000 for 300M-scale stability.
#
#  A' ft_byt5_random   — ask #1, flagship at reference geometry
#  B  abl_trained_attr — ask #2 part 1 (+ saved models)
#  C  intervention reruns (instant replay, minutes)
#  P2 env-latency realism — ask #7
#  P1 7B int4 streaming service — ask #3
#  D' ft(9k) InfoNCE salvage (the non-collapsing loss) — if time remains
#  P3 reorder crossover sweep — ask #5
# ft(18k MSE) is DROPPED: strictly worse init than 9k on every probe.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
echo $$ > /tmp/r5_master3.pid

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

# A' — flagship fine-tune at reference geometry from RANDOM init
wait_tunnel
run ft_byt5_random 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --lr 3e-4 --warmup 1000

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

# D' — InfoNCE salvage fine-tune from the step-9k export
wait_tunnel
run ft_byt5c_step9k_infonce 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 --init-hf /tmp/byt5c_step9k_export \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --loss infonce --lr 1e-4 --warmup 2000

# P3 — einsum-vs-scan reorder crossover sweep
wait_tunnel
bash benchmarks/round5_reorder_sweep.sh

echo "=== $(date +%H:%M:%S) MASTER3 COMPLETE" >&2
