"""Beam search parity vs HF `generate` (sequences AND sequences_scores)."""

import numpy as np
import pytest

import jax.numpy as jnp

from reprover_tpu.generation import TacticGeneratorModel
from reprover_tpu.models import load_hf_t5

B = 2


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(5)
    cfg = HFT5Config(
        vocab_size=64,  # small vocab -> beams collide and EOS fires often
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
        decoder_start_token_id=0,
        eos_token_id=1,
        pad_token_id=0,
    )
    model = T5ForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("hf_beam")
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(11)
    ids = rng.integers(3, 60, size=(B, 13)).astype(np.int32)
    mask = np.ones((B, 13), dtype=np.int32)
    mask[1, 9:] = 0
    ids[mask == 0] = 0
    return ids, mask


def _hf_beams(model, ids, mask, num_beams, max_length, length_penalty):
    import torch

    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            max_length=max_length,
            num_beams=num_beams,
            length_penalty=length_penalty,
            do_sample=False,
            num_return_sequences=num_beams,
            early_stopping=False,
            output_scores=True,
            return_dict_in_generate=True,
        )
    seqs = out.sequences.numpy().reshape(B, num_beams, -1)
    scores = out.sequences_scores.numpy().reshape(B, num_beams)
    return seqs, scores


def _hf_diverse(
    model, ids, mask, num_beams, num_beam_groups, diversity_penalty,
    max_length, length_penalty,
):
    import torch

    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            max_length=max_length,
            num_beams=num_beams,
            num_beam_groups=num_beam_groups,
            diversity_penalty=diversity_penalty,
            length_penalty=length_penalty,
            do_sample=False,
            num_return_sequences=num_beams,
            early_stopping=False,
            output_scores=True,
            return_dict_in_generate=True,
        )
    seqs = out.sequences.numpy().reshape(B, num_beams, -1)
    scores = out.sequences_scores.numpy().reshape(B, num_beams)
    return seqs, scores


def _ours(path, ids, mask, num_beams, max_length, length_penalty,
          num_beam_groups=1, diversity_penalty=0.0):
    params, cfg = load_hf_t5(path)
    from reprover_tpu.models import encode as t5_encode
    from reprover_tpu.models import init_decode_state, decode_step
    from reprover_tpu.models.t5 import DecodeState
    from reprover_tpu.generation.beam_search import beam_search
    from reprover_tpu.generation.generator import _tile_beams

    enc = t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    enc = _tile_beams(enc, num_beams)
    m = _tile_beams(jnp.asarray(mask), num_beams)
    cache = init_decode_state(params, cfg, enc, m, max_length)

    def step_fn(cache, tokens):
        return decode_step(params, cfg, cache, tokens)

    def reorder_fn(cache, flat_parent):
        return DecodeState(
            self_k=jnp.take(cache.self_k, flat_parent, axis=1),
            self_v=jnp.take(cache.self_v, flat_parent, axis=1),
            cross_k=cache.cross_k,
            cross_v=cache.cross_v,
            encoder_hidden=cache.encoder_hidden,
            cross_bias=cache.cross_bias,
            step=cache.step,
        )

    return beam_search(
        step_fn,
        reorder_fn,
        cache,
        batch_size=B,
        num_beams=num_beams,
        max_length=max_length,
        eos_id=cfg.eos_token_id,
        pad_id=cfg.pad_token_id,
        start_id=cfg.decoder_start_token_id,
        length_penalty=length_penalty,
        num_beam_groups=num_beam_groups,
        diversity_penalty=diversity_penalty,
    )


@pytest.mark.parametrize(
    "num_beams,max_length,length_penalty",
    [
        (4, 10, 0.0),  # reference prover setting (`prover/evaluate.py:214`)
        (4, 10, 1.0),  # reference validation setting (HF default lp)
        (8, 16, 0.0),
        (2, 24, 0.0),
        (4, 12, 2.0),
    ],
)
def test_beam_parity(hf_ckpt, inputs, num_beams, max_length, length_penalty):
    path, model = hf_ckpt
    ids, mask = inputs
    hf_seqs, hf_scores = _hf_beams(model, ids, mask, num_beams, max_length, length_penalty)
    res = _ours(path, ids, mask, num_beams, max_length, length_penalty)
    ours_scores = np.asarray(res.scores)
    np.testing.assert_allclose(ours_scores, hf_scores, rtol=2e-4, atol=2e-5)

    ours_seqs = np.asarray(res.sequences)
    ours_lens = np.asarray(res.lengths)
    # Compare token content up to each hypothesis length (HF pads the tail).
    for b in range(B):
        for k in range(num_beams):
            L = ours_lens[b, k]
            hf_row = hf_seqs[b, k]
            np.testing.assert_array_equal(
                ours_seqs[b, k, :L],
                hf_row[:L],
                err_msg=f"b={b} k={k} len={L} ours={ours_seqs[b,k,:L]} hf={hf_row}",
            )
            # HF fills unwritten tail positions with `pad_token_id or eos`
            # (pad=0 is falsy -> fill is eos=1, a known HF quirk); the tail
            # carries no content, only the first L tokens are the hypothesis.
            assert np.all(np.isin(hf_row[L:], [0, 1]))


@pytest.mark.parametrize(
    "num_beams,num_beam_groups,diversity_penalty,max_length,length_penalty",
    [
        (4, 2, 1.0, 10, 0.0),  # two groups, the canonical DBS setting
        (8, 4, 1.0, 16, 0.0),  # 4 groups of 2
        (4, 4, 0.5, 12, 1.0),  # singleton groups, HF-default lp
        (8, 2, 2.0, 16, 0.0),  # strong penalty
    ],
)
def test_diverse_beam_parity(
    hf_ckpt, inputs, num_beams, num_beam_groups, diversity_penalty,
    max_length, length_penalty,
):
    """Grouped (diverse) beam search vs HF `_group_beam_search`: sequences
    AND sequences_scores, including the Hamming diversity penalty and the
    per-(batch, group) done/finalize semantics."""
    path, model = hf_ckpt
    ids, mask = inputs
    hf_seqs, hf_scores = _hf_diverse(
        model, ids, mask, num_beams, num_beam_groups, diversity_penalty,
        max_length, length_penalty,
    )
    res = _ours(
        path, ids, mask, num_beams, max_length, length_penalty,
        num_beam_groups=num_beam_groups, diversity_penalty=diversity_penalty,
    )
    np.testing.assert_allclose(
        np.asarray(res.scores), hf_scores, rtol=2e-4, atol=2e-5
    )
    ours_seqs = np.asarray(res.sequences)
    ours_lens = np.asarray(res.lengths)
    for b in range(B):
        for k in range(num_beams):
            L = ours_lens[b, k]
            np.testing.assert_array_equal(
                ours_seqs[b, k, :L],
                hf_seqs[b, k][:L],
                err_msg=f"b={b} k={k} len={L}",
            )
            assert np.all(np.isin(hf_seqs[b, k][L:], [0, 1]))


def test_diverse_groups_decorrelate(hf_ckpt, inputs):
    """The property the penalty exists for: with a strong penalty, the
    groups' top hypotheses must not all share the classic search's first
    generated token (plain beams here are near-duplicates of one stem)."""
    path, model = hf_ckpt
    ids, mask = inputs
    plain = _ours(path, ids, mask, 8, 12, 0.0)
    diverse = _ours(
        path, ids, mask, 8, 12, 0.0, num_beam_groups=4, diversity_penalty=10.0
    )
    p = np.asarray(plain.sequences)[:, :, 1]
    d = np.asarray(diverse.sequences)[:, :, 1]
    for b in range(B):
        assert len(set(d[b].tolist())) > len(set(p[b].tolist())) or len(
            set(p[b].tolist())
        ) == 8


def test_diverse_group_validation():
    from reprover_tpu.generation.beam_search import beam_search

    with pytest.raises(ValueError, match="divisible"):
        beam_search(
            None, None, None, batch_size=1, num_beams=4, max_length=4,
            eos_id=1, pad_id=0, start_id=0, num_beam_groups=3,
        )


def test_generator_model_generate(hf_ckpt):
    """TacticGeneratorModel end-to-end: strings in, (text, score) out."""
    path, model = hf_ckpt
    params, cfg = load_hf_t5(path)
    gen = TacticGeneratorModel(
        params, cfg, max_inp_seq_len=64, max_oup_seq_len=12, bucket_multiple=16
    )
    out = gen.generate(["abc ⊢ x", "def ⊢ y"], num_samples=4)
    assert len(out) == 2 and all(len(row) == 4 for row in out)
    for row in out:
        scores = [s for _, s in row]
        assert scores == sorted(scores, reverse=True)


def test_topk_candidates_matches_flat_topk():
    """The two-stage (per-beam then global) top-2K must be identical to the
    flat [B, K*V] top_k — scores, parents, tokens, AND tie order (equal
    scores resolve (beam, token)-first in both). Exercised with heavy ties:
    quantized scores and -inf dead-beam rows."""
    import jax
    import numpy as np

    from reprover_tpu.generation.beam_search import NEG_INF, topk_candidates

    rng = np.random.default_rng(0)
    for trial in range(20):
        B, K, V = 3, 4, rng.integers(6, 40)
        k2 = 2 * K
        cand = rng.standard_normal((B, K, V))
        if trial % 2:  # quantize -> many exact ties
            cand = np.round(cand * 2) / 2
        if trial % 3 == 0:  # dead beams (start-of-search shape)
            cand[:, 1:, :] = float(NEG_INF)
        cand = jnp.asarray(cand, jnp.float32)

        flat_scores, flat_idx = jax.lax.top_k(
            cand.reshape(B, K * int(V)), k2
        )
        scores, parent, token = topk_candidates(cand, k2)
        np.testing.assert_array_equal(np.asarray(scores), np.asarray(flat_scores))
        np.testing.assert_array_equal(np.asarray(parent), np.asarray(flat_idx) // int(V))
        np.testing.assert_array_equal(np.asarray(token), np.asarray(flat_idx) % int(V))
