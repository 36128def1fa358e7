"""Decoder-only continuous-batching engine: exact parity with the classic
causal generate path (HF semantics), including staggered admissions, slot
reuse, and serving through the model-agnostic StreamingInferenceService —
the in-framework vLLM role for decoder-only checkpoints
(`/root/reference/prover/proof_search.py:332-366`)."""

import numpy as np
import pytest

import jax

from reprover_tpu.generation.causal_generator import CausalTacticGeneratorModel
from reprover_tpu.models.causal_lm import CausalLMConfig, init_params

CFG = CausalLMConfig(
    vocab_size=64,  # small vocab -> beams collide and EOS fires often
    d_model=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,  # exercise GQA
    d_ff=64,
)
K = 4
PMAX = 16
TDEC = 8


class IdsTokenizer:
    """Maps space-separated ints <-> token ids (no real vocab needed)."""

    def __call__(self, text, add_special_tokens=True):
        return {"input_ids": [int(t) for t in text.split()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(7), CFG)
    model = CausalTacticGeneratorModel(
        params,
        CFG,
        IdsTokenizer(),
        max_inp_seq_len=PMAX,
        max_oup_seq_len=TDEC,
        template="%s",
        bucket_multiple=4,
    )
    rng = np.random.default_rng(11)
    texts = [
        " ".join(str(int(t)) for t in rng.integers(3, CFG.vocab_size, n))
        for n in (5, 9, 3, 7)
    ]
    classic = {t: model.generate([t], num_samples=K)[0] for t in texts}
    return params, model, texts, classic


def _assert_same(got, want):
    assert [t for t, _ in got] == [t for t, _ in want], (got, want)
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-5, atol=1e-6
    )


def _collect(engine, model):
    """Run until every active slot finishes; decode via the wrapper."""
    out = {}
    for _ in range(64):
        if not engine.has_active():
            break
        engine.run_chunk()
        for slot in engine.finished_slots():
            seqs, scores, lens = engine.finalize(slot)
            out[slot] = model.decode_candidates(seqs, scores, lens)
    return out


def _admit_wave(engine, model, slots, texts):
    bucket = max(len(slots), 1)
    b = 1
    while b < bucket:
        b *= 2
    ids, mask = model.tokenize_for_engine(texts + [""] * (b - len(texts)))
    # The empty-string padding row tokenizes to zero tokens — give it one
    # pad column so prefill shapes hold; its slot is -1 (no-op) anyway.
    engine.admit_batch_tokens(slots + [-1] * (b - len(slots)), ids, mask)


def test_aligned_admissions_match_classic(setup):
    params, model, texts, classic = setup
    engine = model.make_stepwise_engine(num_slots=2, num_beams=K, chunk_size=3)
    _admit_wave(engine, model, [0, 1], [texts[0], texts[1]])
    results = _collect(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


def test_staggered_admission_and_slot_reuse(setup):
    """A request admitted mid-decode of another must not perturb either;
    a freed slot must serve a second request classic-exactly."""
    params, model, texts, classic = setup
    engine = model.make_stepwise_engine(num_slots=2, num_beams=K, chunk_size=2)
    _admit_wave(engine, model, [0], [texts[0]])
    engine.run_chunk()  # slot 0 is mid-decode when slot 1 joins
    _admit_wave(engine, model, [1], [texts[1]])
    first = _collect(engine, model)
    _assert_same(first[0], classic[texts[0]])
    _assert_same(first[1], classic[texts[1]])
    _admit_wave(engine, model, [0], [texts[2]])
    second = _collect(engine, model)
    _assert_same(second[0], classic[texts[2]])


def test_streaming_service_serves_causal_model(setup):
    """The model-agnostic streaming service serves a decoder-only generator:
    oversubscribed concurrent requests all match the classic path."""
    import asyncio

    from reprover_tpu.data import Pos
    from reprover_tpu.prover import StreamingInferenceService

    params, model, texts, classic = setup
    svc = StreamingInferenceService(
        model, num_slots=2, num_beams=K, chunk_size=2, pipeline_depth=3
    )
    svc.start()
    try:
        clients = [svc.client() for _ in range(8)]

        async def one(c, text, delay):
            await asyncio.sleep(delay)
            return await c.agenerate(text, "a.lean", "t", Pos(1, 1), K)

        async def go():
            return await asyncio.gather(
                *(
                    one(clients[4 * w + i], texts[i], 0.02 * (4 * w + i))
                    for w in range(2)
                    for i in range(4)
                )
            )

        results = asyncio.run(go())
    finally:
        svc.stop()

    for w in range(2):
        for i in range(4):
            _assert_same(results[4 * w + i], classic[texts[i]])
    snap = svc.stats_snapshot()
    assert snap["admissions"] == 8 and snap["requests"] == 8


def test_bucketed_causal_engine_exact_parity(setup):
    """Length-bucketed stepping is bit-exact for the decoder-only engine
    too (prompt cache untouched; only the per-beam decode caches slice)."""
    params, model, texts, classic = setup
    engine = model.make_stepwise_engine(
        num_slots=2, num_beams=K, chunk_size=2,
        step_buckets=(4, TDEC + 1),
    )
    _admit_wave(engine, model, [0], [texts[0]])
    engine.run_chunk()  # stagger: slot 0 deeper than slot 1 at admit
    _admit_wave(engine, model, [1], [texts[1]])
    results = _collect(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])

    _admit_wave(engine, model, [0], [texts[2]])
    results = _collect(engine, model)
    _assert_same(results[0], classic[texts[2]])
