"""Corpus indexing CLI — embed every premise, save an IndexedCorpus artifact.

Parity with `/root/reference/retrieval/index.py`: load an HF retriever
checkpoint, embed the full corpus, persist embeddings (portable npy/jsonl
directory instead of a pickle).

Usage:
    python -m reprover_tpu.retrieval.indexer \
        --ckpt-path PATH/TO/HF_CKPT --corpus-path corpus.jsonl \
        --output-path indexed_corpus/ [--batch-size 64] [--max-seq-len 1024]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--corpus-path", type=str, required=True)
    parser.add_argument("--output-path", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--max-seq-len", type=int, default=1024)
    args = parser.parse_args()

    from reprover_tpu.parallel import make_mesh
    from reprover_tpu.retrieval.retriever import PremiseRetriever

    mesh = make_mesh()
    retriever = PremiseRetriever.load_hf(
        args.ckpt_path, args.max_seq_len, mesh=mesh
    )
    retriever.load_corpus(args.corpus_path)

    t0 = time.time()
    retriever.reindex_corpus(args.batch_size)
    dt = time.time() - t0
    n = len(retriever.corpus)
    print(f"indexed {n} premises in {dt:.1f}s ({n / max(dt, 1e-9):.1f} premises/s)")

    retriever.to_indexed_corpus().save(args.output_path)
    print(f"saved IndexedCorpus to {args.output_path}")


if __name__ == "__main__":
    main()
