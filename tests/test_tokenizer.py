"""ByT5 tokenizer parity vs the HF ByT5Tokenizer (offline-constructible)."""

import numpy as np
import pytest

from reprover_tpu.tokenizer import ByT5Tokenizer, TokenizedBatch, round_to_bucket

TEXTS = [
    "n : ℕ\n⊢ gcd n n = n",
    "theorem forall_true_iff : (α → true) ↔ true",
    "x",
    "@[simp] lemma vsub_eq_zero_iff_eq {p1 p2 : P} : p1 -ᵥ p2 = (0 : G) ↔ p1 = p2",
]


@pytest.fixture(scope="module")
def hf_tok():
    from transformers import ByT5Tokenizer as HFByT5

    return HFByT5()


def test_encode_matches_hf(hf_tok):
    tok = ByT5Tokenizer()
    for text in TEXTS:
        ours = tok.encode(text)
        theirs = hf_tok(text).input_ids
        assert ours == theirs


@pytest.mark.parametrize("max_length", [4, 10, 64, 1024])
def test_truncation_matches_hf(hf_tok, max_length):
    tok = ByT5Tokenizer()
    for text in TEXTS:
        ours = tok.encode(text, max_length=max_length)
        theirs = hf_tok(text, max_length=max_length, truncation=True).input_ids
        assert ours == theirs


def test_batch_padding_matches_hf_at_exact_length(hf_tok):
    tok = ByT5Tokenizer()
    theirs = hf_tok(TEXTS, padding="longest", return_tensors="np")
    longest = theirs.input_ids.shape[1]
    ours = tok(TEXTS, pad_to=longest)
    np.testing.assert_array_equal(ours.input_ids, theirs.input_ids)
    np.testing.assert_array_equal(ours.attention_mask, theirs.attention_mask)


def test_bucketed_padding_is_multiple():
    tok = ByT5Tokenizer()
    batch = tok(TEXTS, bucket_multiple=128)
    assert batch.seq_len % 128 == 0
    # Mask covers exactly the real tokens.
    lens = [len(tok.encode(t)) for t in TEXTS]
    np.testing.assert_array_equal(batch.attention_mask.sum(axis=1), lens)


def test_decode_roundtrip():
    tok = ByT5Tokenizer()
    for text in TEXTS:
        assert tok.decode(tok.encode(text)) == text


def test_decode_matches_hf_with_specials(hf_tok):
    tok = ByT5Tokenizer()
    ids = tok.encode(TEXTS[0]) + [0, 0, 0]
    assert tok.decode(ids) == hf_tok.decode(ids, skip_special_tokens=True)


def test_round_to_bucket():
    assert round_to_bucket(1, 128) == 128
    assert round_to_bucket(128, 128) == 128
    assert round_to_bucket(129, 128) == 256
    assert round_to_bucket(300, 128, max_len=256) == 256


def test_tokenized_batch_api():
    tok = ByT5Tokenizer()
    batch = tok(TEXTS)
    assert isinstance(batch, TokenizedBatch)
    assert len(batch) == len(TEXTS)
    assert batch.input_ids.dtype == np.int32
