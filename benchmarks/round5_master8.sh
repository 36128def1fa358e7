#!/bin/bash
# Round-5 master queue, take 8 — after the retriever intervention landed:
#   attr_retrcont6k: R@1 76.4 -> 82.9, Pass@1 0.41 -> 0.515 — the FIRST
#   cell that moved the operating point, confirming the copy-rank-1
#   mechanism (Pass@1 tracks R@1). gencont was null twice (bit-identical
#   attribution), so the retrcont x gencont combo cell is dropped; the
#   remaining Pass@1 budget goes to ONE bigger retriever bet instead
#   (+24k steps — training is ~6 min at 68 sps; the cell cost is the
#   eval/prover/attribution tail).
#
#  C6  attr_retrcont24k         — 0.55 target cell
#  P2  env-latency realism      — ask #7
#  P1  7B int4 streaming service — ask #3
#  D'  ft_byt5c_step9k_infonce  — pretrain-utility cell
#  P3  reorder crossover sweep  — ask #5
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
echo $$ > /tmp/r5_master8.pid

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

# C6 — retriever bet: +24k steps (6x the original budget) from the saved ckpt
wait_tunnel
run attr_retrcont24k 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --from-saved --retr-continue 24000

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

echo "=== $(date +%H:%M:%S) MASTER8 COMPLETE" >&2
