#!/bin/bash
# Round-5 master queue, take 6 — reordered after the first two attribution
# intervention cells landed:
#   - attr_exp24 (expansions 10->24): Pass@1 0.41 -> 0.41, a measured NULL
#     exactly as attribution predicted (search_budget bucket = 0);
#   - attr_beams16 in flight when this queue was written (master5's driver
#     was stopped between stages; the running stage finishes untouched).
# The dominant bucket is generator_rank (117/118) and the generator's
# 6k-step loss curve was still descending, so the generator-side
# intervention (--gen-continue: +12k steps from the saved params) jumps
# the queue ahead of the long service stages.
#
#  W   wait for the in-flight attr_beams16 stage (pid arg $1)
#  C2  attr_gencont12k          — generator intervention (ask #2 part 2)
#  C3  attr_gencont12k_beams16  — combo cell (reuses the cont checkpoint)
#  P2  env-latency realism      — ask #7
#  P1  7B int4 streaming service — ask #3
#  D'  ft_byt5c_step9k_infonce  — pretrain-utility cell (scaling-study link)
#  P3  reorder crossover sweep  — ask #5
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
echo $$ > /tmp/r5_master6.pid

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

# W — let the in-flight master5 stage (attr_beams16) finish first
if [ -n "${1:-}" ]; then
  echo "=== $(date +%H:%M:%S) waiting for in-flight stage pid $1" >&2
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
  echo "=== $(date +%H:%M:%S) in-flight stage done" >&2
fi

# C2 — generator-side intervention: +12k steps from the saved checkpoint
wait_tunnel
run attr_gencont12k 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --from-saved --gen-continue 12000

# C3 — combo: continued generator x wider beams (cont checkpoint reused)
wait_tunnel
run attr_gencont12k_beams16 5400 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --from-saved --gen-continue 12000 --prover-beams 16

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

echo "=== $(date +%H:%M:%S) MASTER6 COMPLETE" >&2
