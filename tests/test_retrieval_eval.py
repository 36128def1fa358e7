"""Retrieval validation metrics, predictions artifact, standalone evaluator
(SURVEY.md §4 test plan item 5: metric formulas of `retrieval/evaluate.py`)."""

import json
import pickle

import jax
import numpy as np
import pytest

from reprover_tpu.models import init_params
from reprover_tpu.models.t5 import T5Config
from reprover_tpu.retrieval import (
    PremiseRetriever,
    build_preds_map,
    evaluate_split,
    predict,
    save_predictions,
    validation_metrics,
)
from reprover_tpu.retrieval.datamodule import RetrievalDataModule

TINY = T5Config(
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=1,
)


@pytest.fixture(scope="module")
def dm(toy_corpus_path, toy_dataset_dir):
    dm = RetrievalDataModule(
        data_path=toy_dataset_dir,
        corpus_path=toy_corpus_path,
        num_negatives=2,
        num_in_file_negatives=1,
        batch_size=2,
        eval_batch_size=4,
        max_seq_len=256,
        bucket_multiple=32,
    )
    dm.setup()
    return dm


@pytest.fixture(scope="module")
def retriever(dm):
    params = init_params(jax.random.PRNGKey(0), TINY)
    r = PremiseRetriever(params, TINY, max_seq_len=256, bucket_multiple=32)
    r.load_corpus(dm.corpus)
    return r


# The earliest toy context (gcd_self at d.lean:5) can access exactly 7
# premises (4 in a.lean + 2 in b.lean + 1 in c.lean); k above that raises,
# matching the reference's fewer-than-k error (`common.py:323-324`).
MAX_K = 7


def test_validation_metrics_bounds_and_monotonic(retriever, dm):
    k = MAX_K  # every accessible premise -> Recall@k must be 100%
    metrics = validation_metrics(retriever, dm.val_dataloader(), num_retrieved=k)
    rec = [metrics[f"Recall@{j + 1}_val"] for j in range(k)]
    assert all(0 <= x <= 100 for x in rec)
    assert rec == sorted(rec)  # recall is monotone in k
    assert rec[-1] == pytest.approx(100.0)  # all positives found at k=N
    assert 0 <= metrics["MRR"] <= 1


def test_predict_schema_and_evaluator_roundtrip(
    retriever, dm, toy_dataset_dir, tmp_path
):
    k = MAX_K
    outputs = predict(retriever, dm.predict_dataloader(), num_retrieved=k)
    # one record per (theorem, tactic) over train+val+test = 3 splits x 3 tactics
    assert len(outputs) == 9
    rec = outputs[0]
    for key in (
        "url",
        "commit",
        "file_path",
        "full_name",
        "start",
        "tactic_idx",
        "context",
        "all_pos_premises",
        "retrieved_premises",
        "scores",
    ):
        assert key in rec
    assert len(rec["retrieved_premises"]) == k
    assert rec["scores"] == sorted(rec["scores"], reverse=True)

    # Pickle roundtrip + uniqueness check in build_preds_map.
    path = str(tmp_path / "predictions.pickle")
    save_predictions(outputs, path)
    with open(path, "rb") as f:
        loaded = pickle.load(f)
    # Records from train/val/test duplicate (same toy theorems in each split);
    # keying is per (file, name, start, tactic_idx) so dedup before mapping.
    uniq = {
        (p["file_path"], p["full_name"], tuple(p["start"]), p["tactic_idx"]): p
        for p in loaded
    }
    preds_map = build_preds_map(list(uniq.values()))

    with open(f"{toy_dataset_dir}/val.json") as f:
        data = json.load(f)
    r1, r10, mrr = evaluate_split(data, preds_map)
    assert 0 <= r1 <= 100 and 0 <= r10 <= 100 and 0 <= mrr <= 1
    # With k = corpus size, every positive is retrieved, so MRR > 0.
    assert mrr > 0

    # Hand-check against the formulas on the first tactic with positives.
    thm = data[0]
    pred = preds_map[
        (thm["file_path"], thm["full_name"], tuple(thm["start"]), 0)
    ]
    pos = set(pred["all_pos_premises"])
    expected_r1 = float(pred["retrieved_premises"][0] in pos) / len(pos)
    ranks = [
        j + 1
        for j, p in enumerate(pred["retrieved_premises"])
        if p in pos
    ]
    expected_mrr_first = 1.0 / ranks[0] if ranks else 0.0
    assert 0 <= expected_r1 <= 1 and 0 <= expected_mrr_first <= 1


def test_duplicate_predictions_rejected():
    rec = {
        "file_path": "a.lean",
        "full_name": "x",
        "start": [1, 1],
        "tactic_idx": 0,
    }
    with pytest.raises(AssertionError):
        build_preds_map([rec, dict(rec)])
