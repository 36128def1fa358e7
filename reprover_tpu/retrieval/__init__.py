"""Premise retrieval: dense retriever, indexer, prediction, evaluation, BM25.

Imports are lazy so CPU-only consumers (the BM25 baseline, the standalone
evaluator) don't initialize JAX.
"""

_LAZY = {
    "PremiseRetriever": ("reprover_tpu.retrieval.retriever", "PremiseRetriever"),
    "predict": ("reprover_tpu.retrieval.prediction", "predict"),
    "save_predictions": ("reprover_tpu.retrieval.prediction", "save_predictions"),
    "validation_metrics": ("reprover_tpu.retrieval.prediction", "validation_metrics"),
    "build_preds_map": ("reprover_tpu.retrieval.evaluate", "build_preds_map"),
    "evaluate_split": ("reprover_tpu.retrieval.evaluate", "evaluate_split"),
    "BM25Okapi": ("reprover_tpu.retrieval.bm25", "BM25Okapi"),
}

__all__ = list(_LAZY)


def __getattr__(name: str) -> object:
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(module_name), attr)
