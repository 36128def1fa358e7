"""Stepwise continuous-batching engine: exact parity with the classic
one-shot beam search (HF semantics), including staggered admissions and
slot reuse — the vLLM token-level batching role
(`/root/reference/prover/proof_search.py:332-366`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reprover_tpu.generation.engine import StepwiseBeamEngine
from reprover_tpu.generation.generator import TacticGeneratorModel
from reprover_tpu.models.t5 import T5Config, encode, init_params

CFG = T5Config(
    vocab_size=64,  # small vocab -> beams collide and EOS fires often
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=2,
)
SMAX = 32
TDEC = 12
K = 4


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(5), CFG)
    model = TacticGeneratorModel(
        params, CFG, max_inp_seq_len=SMAX, max_oup_seq_len=TDEC,
        bucket_multiple=SMAX,
    )
    rng = np.random.default_rng(3)
    texts = ["".join(chr(97 + rng.integers(0, 26)) for _ in range(n))
             for n in (9, 14, 6, 11)]
    classic = {
        t: model.generate([t], num_samples=K, max_length=TDEC)[0] for t in texts
    }
    return params, model, texts, classic


def _admit_text(engine, model, slot, text):
    batch = model.tokenizer([text], max_length=SMAX, bucket_multiple=SMAX)
    ids = jnp.asarray(batch.input_ids)
    mask = jnp.asarray(batch.attention_mask)
    enc = encode(engine.params, engine.cfg, ids, mask)
    pad = SMAX - enc.shape[1]
    if pad:
        enc = jnp.pad(enc, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    engine.admit(slot, enc, mask)


def _collect(engine, model):
    """Run chunks until every active slot finishes; return {slot: [(text, score)]}."""
    out = {}
    for _ in range(64):
        if not engine.has_active():
            break
        engine.run_chunk()
        for slot in engine.finished_slots():
            seqs, scores, _ = engine.finalize(slot)
            out[slot] = [
                (model.tokenizer.decode(seqs[k], skip_special_tokens=True),
                 float(scores[k]))
                for k in range(K)
            ]
    return out


def _assert_same(got, want):
    assert [t for t, _ in got] == [t for t, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-5, atol=1e-6
    )


def test_aligned_admissions_match_classic(setup):
    params, model, texts, classic = setup
    engine = StepwiseBeamEngine(
        params, CFG, num_slots=2, num_beams=K,
        max_src_len=SMAX, max_decode_len=TDEC, chunk_size=3,
    )
    _admit_text(engine, model, 0, texts[0])
    _admit_text(engine, model, 1, texts[1])
    results = _collect(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


def test_staggered_admissions_match_classic(setup):
    """A request admitted mid-decode of another must not perturb either."""
    params, model, texts, classic = setup
    engine = StepwiseBeamEngine(
        params, CFG, num_slots=2, num_beams=K,
        max_src_len=SMAX, max_decode_len=TDEC, chunk_size=2,
    )
    _admit_text(engine, model, 0, texts[0])
    engine.run_chunk()  # slot 0 is now 2 tokens deep
    _admit_text(engine, model, 1, texts[1])
    results = _collect(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])


def test_slot_reuse_after_finalize(setup):
    params, model, texts, classic = setup
    engine = StepwiseBeamEngine(
        params, CFG, num_slots=1, num_beams=K,
        max_src_len=SMAX, max_decode_len=TDEC, chunk_size=4,
    )
    _admit_text(engine, model, 0, texts[2])
    first = _collect(engine, model)
    _assert_same(first[0], classic[texts[2]])
    assert engine.free_slots() == [0]
    _admit_text(engine, model, 0, texts[3])
    second = _collect(engine, model)
    _assert_same(second[0], classic[texts[3]])


def test_admit_batch_tokens_wave(setup):
    """One-dispatch wave admission: three requests scattered into a 4-slot
    engine with a padding row (slot -1) must be a no-op for the padding and
    classic-exact for the rest — including a wave admitted mid-decode."""
    params, model, texts, classic = setup
    engine = StepwiseBeamEngine(
        params, CFG, num_slots=4, num_beams=K,
        max_src_len=SMAX, max_decode_len=TDEC, chunk_size=3,
    )

    def wave(slots, wave_texts):
        batch = model.tokenizer(
            wave_texts + [""] * (4 - len(wave_texts)),
            max_length=SMAX, pad_to=SMAX,
        )
        engine.admit_batch_tokens(
            slots + [-1] * (4 - len(slots)),
            batch.input_ids, batch.attention_mask,
        )

    wave([2, 0], [texts[0], texts[1]])
    engine.run_chunk()  # slots 0/2 are mid-decode when slot 1 joins
    wave([1], [texts[2]])
    results = _collect(engine, model)
    _assert_same(results[2], classic[texts[0]])
    _assert_same(results[0], classic[texts[1]])
    _assert_same(results[1], classic[texts[2]])
    assert 3 not in results  # the padding row never occupied slot 3


def test_dispatch_run_status_and_release(setup):
    """The flat status wire format: run-until-event stops on the finish
    event, flags the finished slot, and carries a finalize payload equal to
    the classic result; a release mask in the next dispatch clears the
    slot on device."""
    import numpy as np

    params, model, texts, classic = setup
    engine = StepwiseBeamEngine(
        params, CFG, num_slots=2, num_beams=K,
        max_src_len=SMAX, max_decode_len=TDEC, chunk_size=3,
    )
    _admit_text(engine, model, 0, texts[0])
    f = -1
    for _ in range(64):
        status = engine.dispatch_run(4)
        active, done, n, steps, f, payload = engine.unpack_status(status)
        assert steps <= 4
        if f >= 0:
            break
    assert f == 0 and (done[0] or n[0] >= TDEC)
    seqs, scores, _ = engine.finalize_prefetched(0, payload)
    got = [
        (model.tokenizer.decode(seqs[k], skip_special_tokens=True),
         float(scores[k]))
        for k in range(K)
    ]
    _assert_same(got, classic[texts[0]])

    # Device still shows the slot finished until the release rides along.
    active, done, n = engine.host_status()
    assert active[0]
    release = np.zeros(2, bool)
    release[0] = True
    status = engine.dispatch_run(1, release)
    engine.unpack_status(status)
    active, done, n = engine.host_status()
    assert not active[0] and not done[0]


def test_simultaneous_finish_fallback(setup):
    """Two slots decoding the same input finish on the same step: one
    finish rides the status payload, the other must come back through the
    prefetch-fallback path — both classic-exact. Both requests are queued
    BEFORE the serve thread starts, so they are admitted in one wave and
    the simultaneous finish is deterministic."""
    from reprover_tpu.prover import StreamingInferenceService
    from reprover_tpu.prover.service import GenerateRequest

    params, model, texts, classic = setup
    svc = StreamingInferenceService(
        model, num_slots=2, num_beams=K, chunk_size=3
    )
    clients = [svc.client() for _ in range(2)]
    for c in clients:
        c.request_q.put(
            GenerateRequest(c.client_id, 0, texts[0], "a.lean", "t", (1, 1), K)
        )
    svc.start()
    try:
        r0, r1 = (c.response_q.get(timeout=120) for c in clients)
    finally:
        svc.stop()
    assert r0.error is None and r1.error is None
    _assert_same(r0.candidates, classic[texts[0]])
    _assert_same(r1.candidates, classic[texts[0]])


def test_streaming_service_crash_containment(setup):
    """An engine fault mid-serve fails the outstanding request with an
    error (instead of hanging its client) and the service keeps serving
    subsequent requests after the reset."""
    import asyncio

    from reprover_tpu.data import Pos
    from reprover_tpu.prover import StreamingInferenceService

    params, model, texts, classic = setup
    svc = StreamingInferenceService(
        model, num_slots=2, num_beams=K, chunk_size=3
    )
    svc.start()
    try:
        client = svc.client()

        async def one(text):
            return await client.agenerate(text, "a.lean", "t", Pos(1, 1), K)

        # Sabotage the engine: the next dispatch_run raises.
        import time as _time

        deadline = _time.monotonic() + 60
        while svc._engine is None and _time.monotonic() < deadline:
            _time.sleep(0.05)  # serve thread builds the engine lazily
        real = svc._engine.dispatch_run
        calls = {"n": 0}

        def boom(max_steps, release=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected engine fault")
            return real(max_steps, release)

        svc._engine.dispatch_run = boom
        with pytest.raises(RuntimeError, match="injected engine fault"):
            asyncio.run(one(texts[0]))
        # Service survived: the same client is served correctly afterward.
        r = asyncio.run(one(texts[1]))
    finally:
        svc.stop()
    _assert_same(r, classic[texts[1]])


def test_streaming_service_matches_classic(setup):
    """StreamingInferenceService candidates == classic generate, including a
    mismatched-width request served through the fallback path."""
    import asyncio

    from reprover_tpu.data import Pos
    from reprover_tpu.prover import StreamingInferenceService

    params, model, texts, classic = setup
    svc = StreamingInferenceService(
        model, num_slots=2, num_beams=K, chunk_size=3
    )
    svc.start()
    try:
        clients = [svc.client() for _ in range(3)]

        async def one(c, text, width):
            return await c.agenerate(text, "a.lean", "t", Pos(1, 1), width)

        async def go():
            return await asyncio.gather(
                one(clients[0], texts[0], K),
                one(clients[1], texts[1], K),
                one(clients[2], texts[2], 2),  # width mismatch -> fallback
            )

        r0, r1, r2 = asyncio.run(go())
    finally:
        svc.stop()

    # Engine-served requests match the classic one-shot results exactly.
    # (RemoteTacticGenerator-side postprocessing is not applied here:
    # agenerate returns the raw candidates, same as generate.)
    _assert_same(r0, classic[texts[0]])
    _assert_same(r1, classic[texts[1]])
    # Fallback path: classic generate at width 2.
    want2 = model.generate([texts[2]], num_samples=2, max_length=TDEC)[0]
    _assert_same(r2, want2)
    snap = svc.stats_snapshot()
    assert snap["admissions"] == 2 and snap["fallbacks"] == 1


def test_streaming_fallback_does_not_stall_engine(setup):
    """A non-engine-width request must not block the serve loop: while its
    classic one-shot decode runs (here artificially slow, standing in for a
    fresh-compile stall), engine-width requests keep admitting and
    finishing at their normal cadence (VERDICT r2 weak #3)."""
    import asyncio
    import threading

    from reprover_tpu.data import Pos
    from reprover_tpu.prover import StreamingInferenceService

    params, model, texts, classic = setup
    svc = StreamingInferenceService(
        model, num_slots=2, num_beams=K, chunk_size=3
    )
    real_generate = model.generate
    # The fallback decode BLOCKS until the engine-width requests complete:
    # with the old inline fallback the serve thread would be stuck here, the
    # engine requests could never finish, the wait would time out, and the
    # fallback request would come back as an error. Deterministic, no
    # compile-time-sensitive wall-clock bounds.
    engine_done = threading.Event()

    def slow_generate(states, num_samples, **kw):
        if num_samples != K:  # the fallback width only
            assert engine_done.wait(timeout=120), (
                "engine-width requests stalled while the fallback ran"
            )
        return real_generate(states, num_samples, **kw)

    model.generate = slow_generate
    svc.start()
    try:
        clients = [svc.client() for _ in range(3)]

        async def one(c, text, width):
            return await c.agenerate(text, "a.lean", "t", Pos(1, 1), width)

        async def go():
            fb = asyncio.ensure_future(one(clients[0], texts[2], 2))
            await asyncio.sleep(0.3)  # fallback is on the side thread now
            r0, r1 = await asyncio.gather(
                one(clients[1], texts[0], K),
                one(clients[2], texts[1], K),
            )
            engine_done.set()
            return r0, r1, await fb

        r0, r1, rfb = asyncio.run(go())
    finally:
        engine_done.set()
        model.generate = real_generate
        svc.stop()

    _assert_same(r0, classic[texts[0]])
    _assert_same(r1, classic[texts[1]])
    want_fb = model.generate([texts[2]], num_samples=2, max_length=TDEC)[0]
    _assert_same(rfb, want_fb)
    assert svc.stats_snapshot()["fallbacks"] == 1


def test_streaming_service_oversubscribed(setup):
    """More concurrent requests than slots: the backlog, slot reuse, and
    the stale-status admission barrier in the pipelined serve loop must
    still produce classic-exact results for every request."""
    import asyncio

    from reprover_tpu.data import Pos
    from reprover_tpu.prover import StreamingInferenceService

    params, model, texts, classic = setup
    svc = StreamingInferenceService(
        model, num_slots=2, num_beams=K, chunk_size=2, pipeline_depth=3
    )
    svc.start()
    try:
        # 3 waves over each text -> 12 requests through 2 slots.
        clients = [svc.client() for _ in range(12)]

        async def one(c, text, delay):
            await asyncio.sleep(delay)
            return await c.agenerate(text, "a.lean", "t", Pos(1, 1), K)

        async def go():
            return await asyncio.gather(
                *(
                    one(clients[4 * w + i], texts[i], 0.02 * (4 * w + i))
                    for w in range(3)
                    for i in range(4)
                )
            )

        results = asyncio.run(go())
    finally:
        svc.stop()

    for w in range(3):
        for i in range(4):
            _assert_same(results[4 * w + i], classic[texts[i]])
    snap = svc.stats_snapshot()
    assert snap["admissions"] == 12 and snap["requests"] == 12


def test_bucketed_engine_exact_parity(setup):
    """step_buckets (length-bucketed stepping: reorder/attention run on the
    caches sliced to the smallest bucket covering the deepest working slot)
    must be bit-exact with the classic path, including staggered admissions
    that keep slots at different depths across bucket boundaries."""
    params, model, texts, classic = setup
    engine = StepwiseBeamEngine(
        params, CFG, num_slots=2, num_beams=K,
        max_src_len=SMAX, max_decode_len=TDEC, chunk_size=2,
        step_buckets=(4, 8, TDEC),
    )
    _admit_text(engine, model, 0, texts[0])
    engine.run_chunk()  # slot 0 crosses into a deeper bucket than slot 1
    _admit_text(engine, model, 1, texts[1])
    results = _collect(engine, model)
    _assert_same(results[0], classic[texts[0]])
    _assert_same(results[1], classic[texts[1]])

    # slot reuse after finalize re-enters the smallest bucket
    _admit_text(engine, model, 0, texts[2])
    results = _collect(engine, model)
    _assert_same(results[0], classic[texts[2]])
