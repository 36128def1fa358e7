"""Span-corruption pretraining stage: objective correctness + a tiny
end-to-end fit that exports an HF dir the fine-tune CLIs can load.

The reference assumes pretrained byt5 (`/root/reference/retrieval/model.py:45`);
this stage supplies the missing objective offline (T5 §3.1.4 semantics)."""

import json
import os

import numpy as np
import pytest

from reprover_tpu.tokenizer import BYTE_OFFSET, EOS_ID, VOCAB_SIZE
from reprover_tpu.training.pretrain import (
    PretrainDataModule,
    SENTINEL_START,
    span_corrupt,
    window_length_for,
)


def _reconstruct(tokens, inputs, targets):
    """Invert the corruption: splice each sentinel's span back in."""
    spans = {}
    cur = None
    for t in targets:
        t = int(t)
        if t == EOS_ID:
            break
        if t > 258:  # sentinel
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    out = []
    for t in inputs:
        t = int(t)
        if t == EOS_ID:
            break
        if t > 258:
            out.extend(spans[t])
        else:
            out.append(t)
    return out


@pytest.mark.parametrize("L", [64, 200, 1194])
def test_span_corrupt_roundtrip_and_rates(L):
    rng = np.random.default_rng(0)
    tokens = rng.integers(BYTE_OFFSET, BYTE_OFFSET + 256, L).astype(np.int32)
    inputs, targets = span_corrupt(tokens, rng)
    # Reconstructing inputs+targets yields the original window exactly.
    assert _reconstruct(tokens, inputs, targets) == list(tokens)
    # ~15% of tokens are noise (exact by construction).
    num_noise = sum(1 for t in targets if int(t) <= 258 and t != EOS_ID)
    assert num_noise == min(max(int(np.round(L * 0.15)), 1), L - 1)
    # Sentinels descend from the top of the vocab, matched in both seqs.
    in_sent = [int(t) for t in inputs if int(t) > 258]
    tgt_sent = [int(t) for t in targets if int(t) > 258]
    assert in_sent == tgt_sent
    assert in_sent[0] == SENTINEL_START == VOCAB_SIZE - 1
    assert in_sent == list(range(SENTINEL_START, SENTINEL_START - len(in_sent), -1))
    assert int(inputs[-1]) == EOS_ID and int(targets[-1]) == EOS_ID


def test_window_length_fits_budgets():
    W = window_length_for(1024, 256, 0.15, 20.0)
    rng = np.random.default_rng(1)
    for _ in range(50):
        tokens = rng.integers(3, 259, W).astype(np.int32)
        x, y = span_corrupt(tokens, rng)
        assert len(x) <= 1024 and len(y) <= 256
    # and the window is not wastefully small: ~85% of inputs budget used.
    assert W >= 1024


@pytest.fixture()
def tiny_corpus(tmp_path):
    path = tmp_path / "corpus.jsonl"
    rng = np.random.default_rng(7)
    with open(path, "w") as f:
        for i in range(20):
            prems = [
                {
                    "full_name": f"P{i}_{k}",
                    "start": [1, 1],
                    "end": [2, 2],
                    "code": "theorem t%d_%d : a + b = b + a := by "
                    % (i, k)
                    + "x" * int(rng.integers(50, 400)),
                }
                for k in range(10)
            ]
            f.write(
                json.dumps(
                    {"path": f"F{i}.lean", "imports": [], "premises": prems}
                )
                + "\n"
            )
    return str(path)


def test_datamodule_shapes_and_masking(tiny_corpus):
    dm = PretrainDataModule(
        tiny_corpus,
        batch_size=4,
        max_inp_seq_len=128,
        max_oup_seq_len=64,
        val_fraction=0.1,
        seed=3,
    )
    batch = next(iter(dm.train_dataloader()))
    assert batch["state_ids"].shape == (4, 128)
    assert batch["state_mask"].shape == (4, 128)
    assert batch["tactic_ids"].shape == (4, 64)
    # Mask exactly covers the tokens; targets padded with -100 (CE-masked).
    for i in range(4):
        n = int(batch["state_mask"][i].sum())
        assert (batch["state_ids"][i, :n] > 0).all()
        assert (batch["state_ids"][i, n:] == 0).all()
        tl = int((batch["tactic_ids"][i] != -100).sum())
        assert (batch["tactic_ids"][i, :tl] != -100).all()
        assert (batch["tactic_ids"][i, tl:] == -100).all()
    # Val batches draw from held-out text and are deterministic.
    v1 = dm.val_batches(2)
    v2 = dm.val_batches(2)
    np.testing.assert_array_equal(v1[0]["state_ids"], v2[0]["state_ids"])


def test_pretrain_fit_and_export_loads_in_finetune_cli(tiny_corpus, tmp_path):
    """Tiny end-to-end: fit a few steps, export HF dir, reload through the
    fine-tune CLIs' loader (`load_hf_t5`), and check loss decreased."""
    from reprover_tpu.models import load_hf_t5
    from reprover_tpu.training.pretrain import main

    export_dir = str(tmp_path / "hf_export")
    log_dir = str(tmp_path / "logs")
    main(
        [
            "fit",
            "--data.data_path",
            tiny_corpus,
            "--data.batch_size",
            "2",
            "--data.max_inp_seq_len",
            "128",
            "--data.max_oup_seq_len",
            "64",
            "--model.tiny",
            "true",
            "--model.lr",
            "1e-3",
            "--model.warmup_steps",
            "5",
            "--trainer.max_steps",
            "30",
            "--trainer.val_interval",
            "15",
            "--trainer.log_interval",
            "10",
            "--export_dir",
            export_dir,
            "--log_dir",
            log_dir,
        ]
    )
    params, cfg = load_hf_t5(export_dir)
    assert cfg.vocab_size == VOCAB_SIZE and cfg.d_model == 32
    # The exported params are finite and nontrivial.
    leaves = [np.asarray(x) for x in __import__("jax").tree.leaves(params)]
    assert all(np.isfinite(a).all() for a in leaves)
    # Training moved the loss: read the metrics JSONL.
    metrics = []
    for fn in os.listdir(log_dir):
        if fn.endswith(".jsonl"):
            with open(os.path.join(log_dir, fn)) as f:
                metrics += [json.loads(l) for l in f if l.strip()]
    losses = [m["loss"] for m in metrics if "loss" in m]
    assert losses and losses[-1] < losses[0]
