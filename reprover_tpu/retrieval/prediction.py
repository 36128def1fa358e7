"""Retriever validation metrics + the predictions artifact.

Parity with the reference's validation/prediction steps
(`/root/reference/retrieval/model.py:215-336`):

- :func:`validation_metrics` computes Recall@1..k and MRR per tactic against
  the set of ground-truth positives (`retrieval/model.py:230-268`);
- :func:`predict` produces the per-tactic retrieval records — the
  ``predictions.pickle`` schema consumed by generator training
  (`generation/datamodule.py:150-154`) and by the standalone evaluator
  (`retrieval/evaluate.py:66-78`).

Both run the batched on-device retrieval path (fused masked cosine top-k),
not the reference's argsort + host filter loop.
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, Dict, List

import numpy as np

logger = logging.getLogger(__name__)


def validation_metrics(
    retriever: Any,
    loader: Any,
    num_retrieved: int = 100,
    reindex_batch_size: int = 64,
) -> Dict[str, float]:
    """Recall@1..num_retrieved (%) + MRR over an eval loader.

    Examples whose tactic has no positive premises are skipped
    (`retrieval/model.py:233-236`).
    """
    recall = [[] for _ in range(num_retrieved)]
    mrr: List[float] = []
    retriever.reindex_corpus(batch_size=reindex_batch_size)

    for batch in loader:
        retrieved, _ = retriever.retrieve_batch(batch["context"], num_retrieved)
        for all_pos, premises in zip(batch["all_pos_premises"], retrieved):
            all_pos = set(all_pos)
            if not all_pos:
                continue
            first_match = False
            for j in range(num_retrieved):
                tp = len(all_pos.intersection(premises[: j + 1]))
                recall[j].append(tp / len(all_pos))
                if premises[j] in all_pos and not first_match:
                    mrr.append(1.0 / (j + 1))
                    first_match = True
            if not first_match:
                mrr.append(0.0)

    metrics = {
        f"Recall@{j + 1}_val": 100 * float(np.mean(recall[j])) if recall[j] else 0.0
        for j in range(num_retrieved)
    }
    metrics["MRR"] = float(np.mean(mrr)) if mrr else 0.0
    # Representation health on the freshly reindexed corpus embeddings
    # (training/health.py): the round-5 flagship post-mortem showed the
    # live R@k can erode or collapse while train loss stays flat; eff-rank
    # + off-diag cosine spread make that visible at every validation.
    if getattr(retriever, "corpus_embeddings", None) is not None:
        from reprover_tpu.training.health import (
            embedding_anisotropy,
            embedding_eff_rank,
        )

        probe = np.asarray(retriever.corpus_embeddings[:512])
        metrics["emb_eff_rank"] = embedding_eff_rank(probe)
        metrics.update(embedding_anisotropy(probe))
    return metrics


def predict(
    retriever: Any,
    loader: Any,
    num_retrieved: int = 100,
    reindex_batch_size: int = 64,
) -> List[Dict[str, Any]]:
    """Per-tactic retrieval records (`retrieval/model.py:281-327` schema).

    ``reindex_batch_size`` defaults to the reference's eval/index batch of 64
    (`retrieval/index.py:24`); the in-retriever lazy reindex keeps the
    reference's 32 (`retrieval/model.py:348`)."""
    retriever.reindex_corpus(batch_size=reindex_batch_size)
    outputs: List[Dict[str, Any]] = []
    for batch in loader:
        retrieved, scores = retriever.retrieve_batch(batch["context"], num_retrieved)
        for i in range(len(batch["context"])):
            outputs.append(
                {
                    "url": batch["url"][i],
                    "commit": batch["commit"][i],
                    "file_path": batch["file_path"][i],
                    "full_name": batch["full_name"][i],
                    "start": batch["start"][i],
                    "tactic_idx": batch["tactic_idx"][i],
                    "context": batch["context"][i],
                    "all_pos_premises": batch["all_pos_premises"][i],
                    "retrieved_premises": retrieved[i],
                    "scores": scores[i],
                }
            )
    return outputs


def save_predictions(outputs: List[Dict[str, Any]], path: str) -> None:
    """Write the ``predictions.pickle`` artifact
    (`retrieval/model.py:329-336`)."""
    with open(path, "wb") as f:
        pickle.dump(outputs, f)
    logger.info("retrieval predictions saved to %s", path)
