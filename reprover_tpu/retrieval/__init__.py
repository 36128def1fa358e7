"""Premise retrieval: dense retriever, indexer, evaluation, BM25 baseline."""

from reprover_tpu.retrieval.retriever import PremiseRetriever

__all__ = ["PremiseRetriever"]
