#!/bin/bash
# Round-5 master queue, take 4. Stage A' (random-init byt5 MSE ft at lr
# 3e-4 / warmup 1000) produced a SECOND distinct failure mode
# (r5_ft_byt5_random.json): random byt5 zero-shot is excellent on the full
# 129k pool (R@1 12.2 / R@10 35.8 / MRR 0.20, eff-rank 24) but the
# fine-tune loss bottomed exactly at warmup end (step ~1000) then climbed
# monotonically (0.027 -> 0.068) while the representation collapsed
# (eff-rank 24 -> 1.8, R@10 -> 0.2): post-warmup divergence at byt5
# geometry, the same signature as the lr>=2e-4 pretrains. d256 trains fine
# at 3e-4; byt5 (~300M) does not.
#
# The missing flagship cell is therefore random init x the reference's own
# byt5-small fine-tune schedule (lr 1e-4 / warmup 2000 —
# /root/reference/retrieval/confs/cli_lean4_random.yaml:46-47), which the
# step-9k-init run already proved STABLE at this geometry (flat loss, no
# divergence) — it failed there because of the init, which this cell fixes.
#
#  A'' ft_byt5_random_lr1e4 — ask #1, flagship at reference geometry
#  B   abl_trained_attr     — ask #2 part 1 (+ saved models)
#  C   intervention reruns  — ask #2 part 2 (instant replay)
#  P2  env-latency realism  — ask #7
#  P1  7B int4 streaming service — ask #3
#  D'  ft(9k) InfoNCE salvage — pretrain-utility test with the
#      shift-invariant loss (scaling-study link)
#  P3  reorder crossover sweep — ask #5
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
echo $$ > /tmp/r5_master4.pid

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

# A'' — flagship: random init x reference fine-tune schedule
wait_tunnel
run ft_byt5_random_lr1e4 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --lr 1e-4 --warmup 2000 --skip-step0-eval

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
  --loss infonce --lr 1e-4 --warmup 2000 --skip-step0-eval

# P3 — einsum-vs-scan reorder crossover sweep
wait_tunnel
bash benchmarks/round5_reorder_sweep.sh

echo "=== $(date +%H:%M:%S) MASTER4 COMPLETE" >&2
