#!/bin/bash
# Round-5 master queue, take 2 — tunnel-aware restart after the 17:47 relay
# outage hard-hung the byt5c pretrain at step ~18.8k (zero CPU ticks, blocked
# on a device RPC; benchmarks/results/r5_pretrain_byt5c.err ends at 18800).
#
# Changes vs the killed queue2b -> stage25 -> attr_fix -> perf chain:
#  - The pretrain is NOT resumed. The CPU zero-shot erosion curve
#    (probe_ckpt_zeroshot.py: raw R@10 0.53 @ 9k -> 0.50 @ 12k -> 0.469 @ 15k
#    -> 0.4375 @ 18k) is monotone DOWN while pretrain loss improves, so the
#    final ~2k steps buy nothing; step 18000 was exported offline
#    (export_from_ckpt.py -> /tmp/pretrain_byt5c_export) as the
#    "more-pretrained" scaling point and step 9000 (/tmp/byt5c_step9k_export)
#    is the early-stop flagship init.
#  - Every chip stage is preceded by wait_tunnel: a dead relay makes any
#    default-backend init spin forever in a nanosleep loop, which would have
#    burned each stage's full timeout doing nothing.
#  - Stages run in VERDICT-ask priority order so whatever the round-end
#    cutoff lands on, the most important results exist first:
#      A  ft(step-9k init)          — ask #1, flagship's best init
#      B  d256 attribution chain    — ask #2 part 1 (+ saved models)
#      C  intervention reruns       — ask #2 part 2 (instant replay, fast)
#      P2 env-latency realism       — ask #7 (cheap, cached compiles)
#      P1 7B int4 streaming service — ask #3
#      D  ft(step-18k init), gated  — ask #1 scaling comparison point
#      P3 reorder crossover sweep   — ask #5
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
echo $$ > /tmp/r5_master2.pid

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

# A — flagship fine-tune from the early-stop (step-9k) export
wait_tunnel
run ft_byt5c_step9k 7200 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --geometry byt5 --init-hf /tmp/byt5c_step9k_export \
  --retriever-only --retr-steps 6000 --eval-every 2000 \
  --lr 1e-4 --warmup 2000

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

# D — gated fine-tune from the step-18k export (scaling comparison vs A)
HEALTHY=$(python - <<'PYEOF'
import json
ok = False
try:
    for line in open("benchmarks/results/r5_probe_byt5c_salvage.json"):
        r = json.loads(line)
        if r.get("model") == "byt5-pretrain-export" and not r.get("centered"):
            ok = r["R@10"] >= 0.4
except Exception:
    pass
print("yes" if ok else "no")
PYEOF
)
echo "=== byt5c step-18k export healthy: $HEALTHY" >&2
if [ "$HEALTHY" = "yes" ]; then
  wait_tunnel
  run ft_byt5c_step18k 7200 python benchmarks/synthetic_reference_scale.py \
    --hard --root "$ROOT" --geometry byt5 --init-hf /tmp/pretrain_byt5c_export \
    --retriever-only --retr-steps 6000 --eval-every 2000 \
    --lr 1e-4 --warmup 2000
fi

# P3 — einsum-vs-scan reorder crossover sweep
wait_tunnel
bash benchmarks/round5_reorder_sweep.sh

echo "=== $(date +%H:%M:%S) MASTER2 COMPLETE" >&2
