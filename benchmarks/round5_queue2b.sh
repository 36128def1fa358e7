#!/bin/bash
# Queue 2b — byt5 flagship pretrain, second attempt this round. The 2e-4
# run showed the mid-warmup degradation signature (loss bottomed 0.98 at
# step ~1900, drifted to ~1.3 as lr passed ~1.2e-4; r5_pretrain_byt5b.err)
# — killed proactively before the divergence guard's threshold. Fresh
# lineage at lr 1e-4 / warmup 2000 (the reference's own byt5-small lr,
# retrieval/confs/cli_lean4_random.yaml:46); compiles are now cached so
# the restart costs only the 18 trained minutes.
# Then: CPU health probes -> gated fine-tune -> d256 attribution chain.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
R=benchmarks/results
ROOT=/tmp/synth_hard_scale
D256_EXPORT=/tmp/pretrain_d256_hard_export
BYT5C_EXPORT=/tmp/pretrain_byt5c_export
echo $$ > /tmp/r5_queue2.pid

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) START $name: $*" >&2
  timeout "$tmo" "$@" > "$R/r5_${name}.json" 2> "$R/r5_${name}.err"
  echo "=== $(date +%H:%M:%S) DONE  $name rc=$?" >&2
}

run pretrain_byt5c 7200 python -m reprover_tpu.training.pretrain fit \
  --data.data_path "$ROOT/data/corpus.jsonl" --data.batch_size 16 \
  --model.lr 1e-4 --model.warmup_steps 2000 \
  --trainer.max_steps 30000 --trainer.val_interval 3000 \
  --trainer.time_limit_s 5800 \
  --trainer.ckpt_dir /tmp/pretrain_byt5c_ckpt --trainer.resume true \
  --export_dir "$BYT5C_EXPORT"

EXPORT_DIR="$BYT5C_EXPORT" run probe_byt5c_diversity 2400 \
  python benchmarks/probe_embed_diversity.py
EXPORT_DIR="$BYT5C_EXPORT" run probe_byt5c_salvage 2400 \
  python benchmarks/probe_embed_salvage.py

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
echo "=== byt5c export healthy: $HEALTHY" >&2
if [ "$HEALTHY" = "yes" ]; then
  run ft_byt5c_mse 7200 python benchmarks/synthetic_reference_scale.py \
    --hard --root "$ROOT" --geometry byt5 --init-hf "$BYT5C_EXPORT" \
    --retriever-only --retr-steps 6000 --eval-every 2000 \
    --lr 1e-4 --warmup 2000
fi

run abl_trained_attr 11000 python benchmarks/synthetic_reference_scale.py \
  --hard --root "$ROOT" --init-hf "$D256_EXPORT" \
  --retr-steps 6000 --eval-every 2000 --gen-steps 6000 --save-models

echo "=== $(date +%H:%M:%S) QUEUE 2b COMPLETE" >&2
