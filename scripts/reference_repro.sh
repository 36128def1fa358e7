#!/usr/bin/env bash
# One-command reference repro (role of /root/reference/README.md:146-158):
# download LeanDojo Benchmark 4 + the reference's released HF checkpoints,
# import them into this framework, build the premise index, score retrieval,
# and run the RAG prover — every flag prefilled, so a session WITH network
# (or with the artifacts pre-staged) needs zero thought.
#
# Egress status (re-probed every round; see BASELINE.md "real-data" row):
# rounds 1-5 all fail DNS (`Name or service not known`), so this script has
# only been dry-run against locally-generated stand-ins. Each stage's code
# path IS tested offline: the HF import at full byt5-small geometry against
# locally-saved random-weight torch checkpoints (tests/test_t5_parity_full.py),
# the indexer/evaluator/prover CLIs on the synthetic benchmark
# (tests/test_cli_tools.py, benchmarks/synthetic_reference_scale.py).
#
# Usage:
#   bash scripts/reference_repro.sh [WORKDIR]
# Pre-staged escape hatches (no network needed past them):
#   $WORKDIR/leandojo_benchmark_4/            extracted benchmark
#   $WORKDIR/hf/leandojo-lean4-retriever-byt5-small/   HF dir (torch or flax)
#   $WORKDIR/hf/leandojo-lean4-retriever-tacgen-byt5-small/
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-data}"
mkdir -p "$WORK" "$WORK/hf"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"

RETRIEVER="$WORK/hf/leandojo-lean4-retriever-byt5-small"
GENERATOR="$WORK/hf/leandojo-lean4-retriever-tacgen-byt5-small"
BENCH="$WORK/leandojo_benchmark_4"

# ---- 1. data: Zenodo tarball + MD5 (scripts/download_data.py) -------- #
if [ ! -d "$BENCH" ]; then
  python scripts/download_data.py --data-path "$WORK"
fi

# ---- 2. models: HF snapshots (reference README.md:41-43) ------------- #
for repo in leandojo-lean4-retriever-byt5-small \
            leandojo-lean4-retriever-tacgen-byt5-small; do
  if [ ! -e "$WORK/hf/$repo/config.json" ]; then
    python - "$repo" "$WORK/hf/$repo" <<'EOF'
import sys
from huggingface_hub import snapshot_download
snapshot_download(f"kaiyuy/{sys.argv[1]}", local_dir=sys.argv[2])
EOF
  fi
done

# ---- 3. premise index over the real corpus --------------------------- #
# (load_hf consumes torch OR flax HF dirs; fp32 on CPU, bf16 on TPU.)
if [ ! -e "$WORK/indexed_corpus/embeddings.npy" ]; then
  python -m reprover_tpu.retrieval.indexer \
    --ckpt-path "$RETRIEVER" \
    --corpus-path "$BENCH/corpus.jsonl" \
    --output-path "$WORK/indexed_corpus" \
    --batch-size 64 --max-seq-len 1024
fi

# ---- 4. retrieval predict + R@k/MRR on the random split -------------- #
python -m reprover_tpu.retrieval.main predict \
  --config confs/retrieval_lean4_random.yaml \
  --model.model_name "$RETRIEVER" \
  --data.data_path "$BENCH/random" \
  --data.corpus_path "$BENCH/corpus.jsonl" \
  --preds_out "$WORK/predictions.pickle"
python -m reprover_tpu.retrieval.evaluate \
  --preds-file "$WORK/predictions.pickle" \
  --data-path "$BENCH/random"

# ---- 5. RAG prover on the val split (replay env; pass --lean-dojo to -- #
# drive real Lean if lean_dojo + traced repos are available) ------------ #
python -m reprover_tpu.prover.evaluate \
  --data-path "$BENCH/random" \
  --split val --num-theorems 200 \
  --gen_ckpt_path "$GENERATOR" \
  --ret_ckpt_path "$RETRIEVER" \
  --indexed-corpus-path "$WORK/indexed_corpus" \
  --num-sampled-tactics 64 --timeout 600 --num-workers 4 \
  --save-results

echo "reference repro complete: retrieval metrics + prover Pass@1 above"
