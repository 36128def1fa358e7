"""Premise retrieval: dense retriever, indexer, prediction, evaluation."""

from reprover_tpu.retrieval.retriever import PremiseRetriever
from reprover_tpu.retrieval.predict import (
    predict,
    save_predictions,
    validation_metrics,
)
from reprover_tpu.retrieval.evaluate import build_preds_map, evaluate_split

__all__ = [
    "PremiseRetriever",
    "predict",
    "save_predictions",
    "validation_metrics",
    "build_preds_map",
    "evaluate_split",
]
