#!/bin/bash
# Round-5 queue 2 — replaces round5_main.sh M3/M4 after the flagship
# root-cause shifted from the fine-tune to the PRETRAIN:
#   probe_embed_salvage.py: the 50k-step export retrieves WORSE than random
#   init (zero-shot R@10 0.125 raw AND centered vs 0.84 for random byt5) —
#   the lr-1e-3 warmup-peak divergence visible at steps 400-1000 of
#   r4_pretrain_byt5.err (loss 1.23 -> 2.11) was baked into the whole
#   resumed lineage ("Found 1 checkpoint steps" in resume.err), leaving a
#   rank-1 representation (eff-rank 1.22). Flash is exonerated twice over:
#   on-chip grad parity + the --no-flash A/B collapsing identically
#   (r5_ft_byt5_noflash.json R@10 0.26 vs 0.23).
# So: fresh byt5 pretrain on a SAFE schedule (lr 2e-4, warmup 4000) in a
# new lineage, CPU health probes on the export, fine-tune only if healthy,
# then the attribution chain (ask #2).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
D256_EXPORT=/tmp/pretrain_d256_hard_export
BYT5B_EXPORT=/tmp/pretrain_byt5b_export
echo $$ > /tmp/r5_queue2.pid

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout "$tmo" "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

# wait for the in-flight d256 pretrain (kept from the killed main queue)
while grep -lq "reprover_tpu.training.pretrain" /proc/[0-9]*/cmdline 2>/dev/null; do
  sleep 30
done

# Q2 — fresh flagship pretrain, safe schedule, new lineage. time_limit_s
# exports whatever step count the budget reaches (persistence fixed in
# round 5's "Fix silent loss of time-limited pretrain progress").
run pretrain_byt5b 7200 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 16 \
  --model.lr 2e-4 --model.warmup_steps 4000 \
  --trainer.max_steps 30000 --trainer.val_interval 3000 \
  --trainer.time_limit_s 6000 \
  --trainer.ckpt_dir /tmp/pretrain_byt5b_ckpt --trainer.resume true \
  --export_dir "$BYT5B_EXPORT"

# Q3 — CPU health probes on the new export
EXPORT_DIR="$BYT5B_EXPORT" run probe_byt5b_diversity 2400 \
  python benchmarks/probe_embed_diversity.py
EXPORT_DIR="$BYT5B_EXPORT" run probe_byt5b_salvage 2400 \
  python benchmarks/probe_embed_salvage.py

# Q4 — flagship fine-tune, gated on the export actually carrying signal
# (zero-shot R@10 on the 96-premise pool must beat half the random-init
# level; the poisoned lineage scored 0.125 vs random 0.84)
HEALTHY=$(python - <<'EOF'
import json
ok = False
try:
    for line in open("benchmarks/results/r5_probe_byt5b_salvage.json"):
        r = json.loads(line)
        if r.get("model") == "byt5-pretrain-export" and not r.get("centered"):
            ok = r["R@10"] >= 0.4
except Exception:
    pass
print("yes" if ok else "no")
EOF
)
echo "=== byt5b export healthy: $HEALTHY" >&2
if [ "$HEALTHY" = "yes" ]; then
  run ft_byt5b_mse 7200 python benchmarks/synthetic_reference_scale.py \
    --hard --root "$ROOT" --geometry byt5 --init-hf "$BYT5B_EXPORT" \
    --retriever-only --retr-steps 6000 --eval-every 2000 \
    --lr 1e-4 --warmup 2000
fi

# Q1 — attribution deliverable (ask #2), saved models for intervention
# reruns via --from-saved
run abl_trained_attr 11000 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --init-hf "$D256_EXPORT" \
  --retr-steps 6000 --eval-every 2000 --gen-steps 6000 --save-models

echo "=== $(date +%H:%M:%S) QUEUE 2 COMPLETE" >&2
