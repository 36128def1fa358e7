"""Tensor-parallel serving: the stepwise engines sharded over a mesh's
`model` axis must match the single-device engines and the classic generate
path — the reference's vLLM ``tensor_parallel_size=num_gpus`` role
(`/root/reference/prover/proof_search.py:345`), which round 2 left
training-only. Runs on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reprover_tpu.generation.causal_generator import CausalTacticGeneratorModel
from reprover_tpu.generation.generator import TacticGeneratorModel
from reprover_tpu.models.causal_lm import (
    CausalLMConfig,
    init_params as causal_init_params,
)
from reprover_tpu.models.t5 import T5Config, init_params
from reprover_tpu.parallel import make_mesh

# num_heads / d_ff / vocab all divisible by 8 so the full data=1 x model=8
# mesh is a valid tensor-parallel degree.
T5_CFG = T5Config(
    vocab_size=64,
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=8,
    num_encoder_layers=2,
    num_decoder_layers=2,
)
CAUSAL_CFG = CausalLMConfig(
    vocab_size=64,
    d_model=64,
    num_layers=2,
    num_heads=16,
    num_kv_heads=8,  # GQA under TP: 1 KV head per device at model=8
    d_ff=64,
)
K = 4
SMAX = 32
PMAX = 16
TDEC = 10


class IdsTokenizer:
    def __call__(self, text, add_special_tokens=True):
        return {"input_ids": [int(t) for t in text.split()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def t5_setup():
    params = init_params(jax.random.PRNGKey(5), T5_CFG)
    model = TacticGeneratorModel(
        params, T5_CFG, max_inp_seq_len=SMAX, max_oup_seq_len=TDEC,
        bucket_multiple=SMAX,
    )
    rng = np.random.default_rng(3)
    texts = ["".join(chr(97 + rng.integers(0, 26)) for _ in range(n))
             for n in (9, 14, 6)]
    classic = {
        t: model.generate([t], num_samples=K, max_length=TDEC)[0]
        for t in texts
    }
    return model, texts, classic


@pytest.fixture(scope="module")
def causal_setup():
    params = causal_init_params(jax.random.PRNGKey(7), CAUSAL_CFG)
    model = CausalTacticGeneratorModel(
        params, CAUSAL_CFG, IdsTokenizer(),
        max_inp_seq_len=PMAX, max_oup_seq_len=TDEC,
        template="%s", bucket_multiple=4,
    )
    rng = np.random.default_rng(11)
    texts = [
        " ".join(str(int(t)) for t in rng.integers(3, CAUSAL_CFG.vocab_size, n))
        for n in (5, 9, 3)
    ]
    classic = {t: model.generate([t], num_samples=K)[0] for t in texts}
    return model, texts, classic


def _assert_same(got, want):
    assert [t for t, _ in got] == [t for t, _ in want], (got, want)
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=2e-4, atol=1e-5
    )


def _collect_t5(engine, model):
    out = {}
    for _ in range(64):
        if not engine.has_active():
            break
        engine.run_chunk()
        for slot in engine.finished_slots():
            seqs, scores, lens = engine.finalize(slot)
            out[slot] = model.decode_candidates(seqs, scores, lens)
    return out


def _admit_t5_wave(engine, model, slots, texts):
    ids, mask = model.tokenize_for_engine(texts)
    engine.admit_batch_tokens(slots, ids, mask)


def _admit_causal_wave(engine, model, slots, texts):
    b = 1
    while b < max(len(slots), 1):
        b *= 2
    ids, mask = model.tokenize_for_engine(texts + [""] * (b - len(texts)))
    engine.admit_batch_tokens(slots + [-1] * (b - len(slots)), ids, mask)


@pytest.mark.parametrize("data,model_par", [(1, 8), (4, 2)])
def test_t5_tp_engine_matches_classic(t5_setup, data, model_par):
    model, texts, classic = t5_setup
    mesh = make_mesh(data=data, model=model_par)
    engine = model.make_stepwise_engine(
        num_slots=2, num_beams=K, chunk_size=3, mesh=mesh
    )
    # Params and KV caches actually sharded over `model`.
    assert not engine.state.self_k.sharding.is_fully_replicated or model_par == 1
    _admit_t5_wave(engine, model, [0, 1], [texts[0], texts[1]])
    results = _collect_t5(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


def test_t5_tp_staggered_admission_and_slot_reuse(t5_setup):
    """Token-granular admission + slot reuse under TP: identical beam
    results to the single-device engine's semantics."""
    model, texts, classic = t5_setup
    mesh = make_mesh(data=1, model=8)
    engine = model.make_stepwise_engine(
        num_slots=2, num_beams=K, chunk_size=2, mesh=mesh
    )
    _admit_t5_wave(engine, model, [0], [texts[0]])
    engine.run_chunk()  # slot 0 mid-decode when slot 1 joins
    _admit_t5_wave(engine, model, [1], [texts[1]])
    first = _collect_t5(engine, model)
    _assert_same(first[0], classic[texts[0]])
    _assert_same(first[1], classic[texts[1]])
    assert set(engine.free_slots()) == {0, 1}
    _admit_t5_wave(engine, model, [0], [texts[2]])
    second = _collect_t5(engine, model)
    _assert_same(second[0], classic[texts[2]])


@pytest.mark.parametrize("data,model_par", [(1, 8), (4, 2)])
def test_causal_tp_engine_matches_classic(causal_setup, data, model_par):
    model, texts, classic = causal_setup
    mesh = make_mesh(data=data, model=model_par)
    engine = model.make_stepwise_engine(
        num_slots=2, num_beams=K, chunk_size=3, mesh=mesh
    )
    assert not engine.state.dec_k.sharding.is_fully_replicated or model_par == 1
    _admit_causal_wave(engine, model, [0, 1], [texts[0], texts[1]])
    results = _collect_t5(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


@pytest.mark.parametrize("family", ["t5", "causal"])
def test_tp_scan_reorder_matches_classic(t5_setup, causal_setup, family):
    """TP mesh x scan reorder: the layer-blocked in-place reorder is the
    HBM-ceiling serving option, so it must partition under GSPMD (the
    sharded cache's layer axis is unsharded; dynamic_update_slice along it
    is mesh-local) and stay classic-exact."""
    setup = t5_setup if family == "t5" else causal_setup
    model, texts, classic = setup
    mesh = make_mesh(data=1, model=8 if family == "t5" else 2)
    engine = model.make_stepwise_engine(
        num_slots=2, num_beams=K, chunk_size=3, mesh=mesh,
        reorder_mode="scan",
    )
    admit = _admit_t5_wave if family == "t5" else _admit_causal_wave
    admit(engine, model, [0, 1], [texts[0], texts[1]])
    results = _collect_t5(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


def test_tp_streaming_service_end_to_end(t5_setup):
    """The StreamingInferenceService drives a tensor-parallel engine
    transparently (mesh pass-through)."""
    import asyncio

    from reprover_tpu.data import Pos
    from reprover_tpu.prover.service import StreamingInferenceService

    model, texts, classic = t5_setup
    mesh = make_mesh(data=1, model=8)
    svc = StreamingInferenceService(
        model, num_slots=2, num_beams=K, chunk_size=3, mesh=mesh
    )
    svc.start()
    try:
        client = svc.client()
        results = [
            asyncio.run(client.agenerate(t, "f.lean", "t", Pos(1, 1), K))
            for t in texts[:2]
        ]
    finally:
        svc.stop()
    for t, got in zip(texts[:2], results):
        want = classic[t]
        # The service dedups identical decoded tactics keeping the best
        # score (`/root/reference/prover/tactic_generator.py:235-241`).
        want_dedup = {}
        for txt, score in want:
            want_dedup.setdefault(txt, score)
        got_map = dict(got)
        assert set(got_map) == set(want_dedup)
        for txt in got_map:
            np.testing.assert_allclose(
                got_map[txt], want_dedup[txt], rtol=2e-4, atol=1e-5
            )


def test_tp_rejects_indivisible_heads():
    params = init_params(jax.random.PRNGKey(0), T5_CFG)
    cfg6 = T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_heads=8,
        num_encoder_layers=2, num_decoder_layers=2,
    )
    model = TacticGeneratorModel(
        params, cfg6, max_inp_seq_len=SMAX, max_oup_seq_len=TDEC,
        bucket_multiple=SMAX,
    )
    mesh = make_mesh(data=2, model=4)  # 8 heads % 4 == 0: fine
    model.make_stepwise_engine(num_slots=1, num_beams=K, mesh=mesh)
    # byt5-small has 6 heads: TP degree must divide them.
    import dataclasses

    from reprover_tpu.generation.engine import StepwiseBeamEngine

    with pytest.raises(AssertionError, match="must divide num_heads"):
        StepwiseBeamEngine(
            params, dataclasses.replace(cfg6, num_heads=6), num_slots=1,
            num_beams=K, max_src_len=SMAX, max_decode_len=TDEC, mesh=mesh,
        )


def test_t5_tp_bucketed_engine_matches_classic(t5_setup):
    """TP x length-bucketed stepping: the lax.switch bucket branches slice
    head-sharded KV caches — sharding propagation through the switch must
    preserve exact beam results."""
    model, texts, classic = t5_setup
    mesh = make_mesh(data=1, model=8)
    engine = model.make_stepwise_engine(
        num_slots=2, num_beams=K, chunk_size=2, mesh=mesh,
        step_buckets=(4, TDEC),
    )
    _admit_t5_wave(engine, model, [0], [texts[0]])
    engine.run_chunk()  # slot 0 deeper than slot 1 across a bucket edge
    _admit_t5_wave(engine, model, [1], [texts[1]])
    results = _collect_t5(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


@pytest.mark.parametrize("family", ["t5", "causal"])
def test_tp_int8_engine_matches_quantized_classic(t5_setup, causal_setup, family):
    """TP x int8 composition: the engine quantizes with kernel_ok=False
    (no Pallas routing under GSPMD), shards the QuantWeight tree over
    `model` (spec builder mirrors the int8/scale leaves), and must
    reproduce the single-device quantized classic path's beams — per-chip
    weight HBM is halved twice (int8 x TP)."""
    from reprover_tpu.models.quantize import (
        QuantWeight,
        quantize_causal_params,
        quantize_t5_params,
    )

    mesh = make_mesh(data=1, model=8)
    if family == "t5":
        model, texts, _ = t5_setup
        classic_model = TacticGeneratorModel(
            quantize_t5_params(model.params), T5_CFG, max_inp_seq_len=SMAX,
            max_oup_seq_len=TDEC, bucket_multiple=SMAX,
        )
        classic = {
            t: classic_model.generate([t], num_samples=K, max_length=TDEC)[0]
            for t in texts[:2]
        }
        engine = model.make_stepwise_engine(
            num_slots=2, num_beams=K, chunk_size=3, mesh=mesh, quantize=True
        )
        lm_head = engine.params["lm_head"]
    else:
        model, texts, _ = causal_setup
        classic_model = CausalTacticGeneratorModel(
            quantize_causal_params(model.params), CAUSAL_CFG, IdsTokenizer(),
            max_inp_seq_len=PMAX, max_oup_seq_len=TDEC,
            template="%s", bucket_multiple=4,
        )
        classic = {
            t: classic_model.generate([t], num_samples=K)[0] for t in texts[:2]
        }
        engine = model.make_stepwise_engine(
            num_slots=2, num_beams=K, chunk_size=3, mesh=mesh, quantize=True
        )
        lm_head = engine.params["lm_head"]
    # int8 weights really are sharded over the mesh's model axis
    assert isinstance(lm_head, QuantWeight) and not lm_head.kernel_ok
    assert not lm_head.q.sharding.is_fully_replicated
    if family == "t5":
        _admit_t5_wave(engine, model, [0, 1], [texts[0], texts[1]])
    else:
        _admit_causal_wave(engine, model, [0, 1], [texts[0], texts[1]])
    results = _collect_t5(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


@pytest.mark.parametrize("family", ["t5", "causal"])
def test_tp_int4_engine_matches_quantized_classic(t5_setup, causal_setup, family):
    """TP x int4 composition (the remaining vLLM-quantization tier,
    `/root/reference/prover/proof_search.py:345`): Quant4Weight leaves are
    sharded over `model` — packed nibbles (K axis) and per-K-group scales
    take the weight's own spec, so column splits shard O on both and row
    splits shard K/2 and K/g in lockstep — and the engine must reproduce
    the single-device int4 classic path's beams exactly."""
    from reprover_tpu.models.quantize import (
        Quant4Weight,
        quantize_causal_params,
        quantize_t5_params,
    )

    mesh = make_mesh(data=1, model=8 if family == "t5" else 2)
    if family == "t5":
        model, texts, _ = t5_setup
        classic_model = TacticGeneratorModel(
            quantize_t5_params(model.params, bits=4), T5_CFG,
            max_inp_seq_len=SMAX, max_oup_seq_len=TDEC, bucket_multiple=SMAX,
        )
        classic = {
            t: classic_model.generate([t], num_samples=K, max_length=TDEC)[0]
            for t in texts[:2]
        }
        engine = model.make_stepwise_engine(
            num_slots=2, num_beams=K, chunk_size=3, mesh=mesh, quantize="int4"
        )
        lm_head = engine.params["lm_head"]
    else:
        model, texts, _ = causal_setup
        classic_model = CausalTacticGeneratorModel(
            quantize_causal_params(model.params, bits=4), CAUSAL_CFG,
            IdsTokenizer(), max_inp_seq_len=PMAX, max_oup_seq_len=TDEC,
            template="%s", bucket_multiple=4,
        )
        classic = {
            t: classic_model.generate([t], num_samples=K)[0] for t in texts[:2]
        }
        engine = model.make_stepwise_engine(
            num_slots=2, num_beams=K, chunk_size=3, mesh=mesh, quantize="int4"
        )
        lm_head = engine.params["lm_head"]
    # packed int4 weights really are sharded over the mesh's model axis
    assert isinstance(lm_head, Quant4Weight) and not lm_head.kernel_ok
    assert not lm_head.q.sharding.is_fully_replicated
    if family == "t5":
        _admit_t5_wave(engine, model, [0, 1], [texts[0], texts[1]])
    else:
        _admit_causal_wave(engine, model, [0, 1], [texts[0], texts[1]])
    results = _collect_t5(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])
