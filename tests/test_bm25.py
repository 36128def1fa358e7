"""BM25 baseline: C++/Python BPE parity, Okapi scoring vs brute force,
accessible-subset retrieval, end-to-end predictions artifact."""

import json
import math
import os
import pickle
from collections import Counter

import numpy as np
import pytest

from reprover_tpu.native import BpeTokenizer, native_available
from reprover_tpu.native.bpe import pre_tokenize
from reprover_tpu.retrieval.bm25 import (
    BM25Okapi,
    process_theorem,
    run_bm25,
    train_tokenizer,
)

TRAIN_TEXTS = [
    "theorem gcd_self (n : Nat) : gcd n n = n",
    "theorem gcd_zero_left (x : Nat) : gcd 0 x = x",
    "def Nat.gcd : Nat → Nat → Nat := fun x y => y",
    "n : ℕ ⊢ gcd n n = n",
    "x y : ℕ ⊢ gcd (succ x) y = gcd (y % succ x) (succ x)",
    "simp [Nat.mod_self, Nat.gcd_succ]",
] * 3


class TestBpe:
    def test_pre_tokenize_whitespace_rule(self):
        # \w+ | [^\w\s]+ — identifiers with _ and ., unicode turnstile
        assert pre_tokenize("gcd_self (n : Nat)") == [
            "gcd_self",
            "(",
            "n",
            ":",
            "Nat",
            ")",
        ]
        assert pre_tokenize("⊢ gcd n") == ["⊢", "gcd", "n"]
        assert pre_tokenize("Nat.gcd") == ["Nat", ".", "gcd"]

    def test_train_and_encode_python(self):
        tok = BpeTokenizer(force_python=True)
        tok.train(TRAIN_TEXTS, vocab_size=80)
        assert tok.vocab[:5] == ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        toks = tok.encode("gcd n n")
        assert "".join(toks) == "gcdnn"
        # unknown symbol maps to [UNK]
        assert "[UNK]" in tok.encode("∀ unseen ¿")  # ∀/¿ never in training

    @pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
    def test_cpp_matches_python(self):
        py = BpeTokenizer(force_python=True)
        py.train(TRAIN_TEXTS, vocab_size=120)
        cc = BpeTokenizer()
        assert cc._lib is not None
        cc.train(TRAIN_TEXTS, vocab_size=120)
        assert sorted(py.vocab) == sorted(cc.vocab)
        for text in TRAIN_TEXTS + ["gcd_self n", "⊢ gcd (succ x) y", "zzz qqq"]:
            assert py.encode(text) == cc.encode(text), text

    @pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
    def test_cpp_save_load_roundtrip(self, tmp_path):
        cc = BpeTokenizer()
        cc.train(TRAIN_TEXTS, vocab_size=100)
        path = str(tmp_path / "tok.bin")
        cc.save(path)
        loaded = BpeTokenizer.load(path)
        for text in TRAIN_TEXTS:
            assert loaded.encode(text) == cc.encode(text)

    def test_python_save_load_roundtrip(self, tmp_path):
        py = BpeTokenizer(force_python=True)
        py.train(TRAIN_TEXTS, vocab_size=100)
        path = str(tmp_path / "tok.json")
        py.save(path)
        loaded = BpeTokenizer.load(path, force_python=True)
        for text in TRAIN_TEXTS:
            assert loaded.encode(text) == py.encode(text)


def brute_force_bm25(corpus_tokens, query, k1=1.5, b=0.75, epsilon=0.25):
    """Direct transcription of the rank_bm25 BM25Okapi formulas."""
    n = len(corpus_tokens)
    doc_len = [len(d) for d in corpus_tokens]
    avgdl = sum(doc_len) / n
    df = Counter()
    for d in corpus_tokens:
        df.update(set(d))
    idf = {t: math.log((n - c + 0.5) / (c + 0.5)) for t, c in df.items()}
    avg_idf = sum(idf.values()) / len(idf)
    idf = {t: (v if v >= 0 else epsilon * avg_idf) for t, v in idf.items()}
    scores = []
    for d, dl in zip(corpus_tokens, doc_len):
        tf = Counter(d)
        s = 0.0
        for t in query:
            if t not in tf:
                continue
            f = tf[t]
            s += idf[t] * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    return np.array(scores)


class TestBM25Okapi:
    CORPUS = [
        ["gcd", "n", "n", "=", "n"],
        ["gcd", "0", "x", "=", "x"],
        ["mod", "self", "n", "%", "n", "=", "0"],
        ["succ", "x", "y", "gcd"],
    ]

    def test_scores_match_brute_force(self):
        bm25 = BM25Okapi(self.CORPUS)
        for query in (["gcd", "n"], ["x"], ["%", "mod"], ["missing"], []):
            np.testing.assert_allclose(
                bm25.get_scores(query),
                brute_force_bm25(self.CORPUS, query),
                rtol=1e-12,
                atol=1e-12,
            )

    def test_batch_scores_subset(self):
        bm25 = BM25Okapi(self.CORPUS)
        full = bm25.get_scores(["gcd", "n"])
        sub = bm25.get_batch_scores(["gcd", "n"], [2, 0])
        np.testing.assert_allclose(sub, full[[2, 0]])


class TestBm25Pipeline:
    def test_process_theorem_accessibility(self, toy_corpus, toy_dataset_dir):
        tok = BpeTokenizer(force_python=True)
        premises = [p.serialize() for p in toy_corpus.all_premises]
        tok.train(premises, vocab_size=300)
        bm25 = BM25Okapi([tok.encode(p) for p in premises])
        with open(os.path.join(toy_dataset_dir, "val.json")) as f:
            thm = json.load(f)[0]
        preds = process_theorem(
            thm, num_retrieved=4, corpus=toy_corpus, tokenizer=tok, bm25=bm25
        )
        assert len(preds) == 2  # two tactics
        accessible = set(
            toy_corpus.get_accessible_premise_indexes(
                thm["file_path"], tuple(thm["start"])
            )
        )
        for p in preds:
            for prem in p["retrieved_premises"]:
                assert toy_corpus.premise_index(prem) in accessible
            assert p["scores"] == sorted(p["scores"], reverse=True)

    def test_end_to_end_single_process(
        self, toy_corpus_path, toy_dataset_dir, tmp_path
    ):
        # corpus.jsonl must sit next to the dataset dir ("../corpus.jsonl")
        data_dir = tmp_path / "random"
        data_dir.mkdir()
        for split in ("train", "val", "test"):
            os.link(
                os.path.join(toy_dataset_dir, f"{split}.json"),
                data_dir / f"{split}.json",
            )
        os.link(toy_corpus_path, tmp_path / "corpus.jsonl")

        tok_path = str(tmp_path / "bpe.tok")
        train_tokenizer(str(data_dir), tok_path, vocab_size=300)
        out = str(tmp_path / "preds.pickle")
        run_bm25(tok_path, str(data_dir), out, num_retrieved=4, num_cpus=1)
        with open(out, "rb") as f:
            preds = pickle.load(f)
        assert len(preds) == 9  # 3 splits x 3 tactics

        # The BM25 predictions artifact is evaluable by the shared evaluator.
        from reprover_tpu.retrieval import build_preds_map, evaluate_split

        uniq = {
            (p["file_path"], p["full_name"], tuple(p["start"]), p["tactic_idx"]): p
            for p in preds
        }
        with open(os.path.join(toy_dataset_dir, "val.json")) as f:
            data = json.load(f)
        r1, r10, mrr = evaluate_split(data, build_preds_map(list(uniq.values())))
        assert 0 <= r1 <= 100 and 0 <= r10 <= 100 and 0 <= mrr <= 1
        # gcd-heavy corpus: BM25 must rank a gcd premise for the gcd goal
        assert mrr > 0
