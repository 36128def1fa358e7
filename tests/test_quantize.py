"""Weight-only int8 serving: quantization math, T5 tree mapping, and
near-lossless beam-search generation vs the full-precision model."""

import jax
import jax.numpy as jnp
import numpy as np

from reprover_tpu.models.quantize import (
    QuantWeight,
    quantize_t5_params,
    quantize_weight,
    quantized_dense,
)
from reprover_tpu.models.t5 import T5Config, init_params

TINY = T5Config(
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=2,
)


def test_quantized_dense_close_to_full():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
    qw = quantize_weight(w)
    assert qw.q.dtype == jnp.int8
    full = np.asarray(x @ w)
    quant = np.asarray(quantized_dense(x, qw, jnp.float32))
    # error relative to the output scale (near-zero outputs would blow up a
    # pointwise relative metric)
    assert np.abs(quant - full).max() / np.abs(full).std() < 0.05
    assert np.median(np.abs(quant - full) / (np.abs(full) + 1e-3)) < 0.02


def test_stacked_layer_axis_quantizes_independently():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 16, 8)), jnp.float32)
    w = w * jnp.asarray([1.0, 10.0, 100.0])[:, None, None]  # distinct ranges
    qw = quantize_weight(w)
    assert qw.scale.shape == (3, 1, 8)
    recon = np.asarray(qw.q, np.float32) * np.asarray(qw.scale)
    # quantization step for each layer slice is bounded by ITS OWN absmax
    # (independent scales), not the global one
    for i, mag in enumerate((1.0, 10.0, 100.0)):
        step = np.abs(np.asarray(w[i])).max() / 127.0
        assert np.abs(recon[i] - np.asarray(w[i])).max() <= step * 0.5 + 1e-6


def test_quantize_t5_tree_targets_matmuls_only():
    params = init_params(jax.random.PRNGKey(0), TINY)
    qparams = quantize_t5_params(params)
    assert isinstance(qparams["encoder"]["layers"]["attn"]["q"], QuantWeight)
    assert isinstance(qparams["decoder"]["layers"]["mlp"]["wo"], QuantWeight)
    assert isinstance(qparams["lm_head"], QuantWeight)
    # non-matmul leaves untouched
    assert not isinstance(qparams["shared_embedding"], QuantWeight)
    assert not isinstance(qparams["encoder"]["rel_bias"], QuantWeight)
    assert not isinstance(
        qparams["encoder"]["layers"]["attn_norm"], QuantWeight
    )


def test_quantized_forward_close_and_generation_runs():
    from reprover_tpu.generation.generator import TacticGeneratorModel
    from reprover_tpu.models.t5 import decode, encode, shift_right

    params = init_params(jax.random.PRNGKey(0), TINY)
    qparams = quantize_t5_params(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, TINY.vocab_size, (2, 32)), jnp.int32)
    mask = jnp.ones((2, 32), jnp.int32)
    labels = jnp.asarray(rng.integers(3, TINY.vocab_size, (2, 8)), jnp.int32)
    dec_in = shift_right(labels, TINY)

    logits_f = np.asarray(decode(params, TINY, encode(params, TINY, ids, mask), mask, dec_in))
    logits_q = np.asarray(decode(qparams, TINY, encode(qparams, TINY, ids, mask), mask, dec_in))
    # logit error small relative to the logit spread
    assert np.abs(logits_f - logits_q).max() / logits_f.std() < 0.2

    # quantized beam search executes end to end with well-formed output
    quant = TacticGeneratorModel(
        qparams, TINY, max_inp_seq_len=128, max_oup_seq_len=12, bucket_multiple=32
    )
    out = quant.generate(["⊢ 2 = 2"], num_samples=3)[0]
    assert len(out) == 3
    scores = [s for _, s in out]
    assert all(np.isfinite(scores)) and scores == sorted(scores, reverse=True)


def test_pallas_quant_matmul_interpret():
    """w8a16 kernel == dequantized XLA reference (interpret mode)."""
    from reprover_tpu.ops.quant_matmul import quant_matmul

    rng = np.random.default_rng(2)
    # 1100 > _BLOCK_M exercises the M-blocked path with a padded last
    # block (1100 -> 1536) — the prompt-admission shape class whose full-M
    # tile blew scoped VMEM at 7B geometry before the M grid existed.
    for m, k, n in ((64, 1472, 384), (8, 384, 1472), (5, 256, 128), (1100, 256, 512)):
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        qw = quantize_weight(w)
        ref = np.asarray(x) @ (
            np.asarray(qw.q, np.float32) * np.asarray(qw.scale)
        )
        out = np.asarray(
            quant_matmul(x, qw.q, qw.scale.reshape(-1), interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


# ------------------------------------------------------------------ #
# Decoder-only (LLaMA-family) int8 + engine serving paths
# ------------------------------------------------------------------ #

from reprover_tpu.models.causal_lm import CausalLMConfig
from reprover_tpu.models.causal_lm import init_params as init_causal_params
from reprover_tpu.models.quantize import quantize_causal_params

CAUSAL_TINY = CausalLMConfig(
    vocab_size=64,
    d_model=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,  # exercise GQA
    d_ff=64,
)


def test_quantize_causal_tree_targets_matmuls_only_and_idempotent():
    params = init_causal_params(jax.random.PRNGKey(3), CAUSAL_TINY)
    qparams = quantize_causal_params(params)
    layers = qparams["layers"]
    for key in ("q", "k", "v", "o", "gate", "up", "down"):
        assert isinstance(layers[key], QuantWeight), key
    assert isinstance(qparams["lm_head"], QuantWeight)
    assert not isinstance(qparams["embedding"], QuantWeight)
    assert not isinstance(layers["input_norm"], QuantWeight)
    # re-quantizing an already-quantized tree is a no-op (the generator
    # and the engine may each be asked to quantize)
    q2 = quantize_causal_params(qparams)
    assert q2["lm_head"] is qparams["lm_head"]


def test_quantized_causal_forward_close():
    from reprover_tpu.models.causal_lm import forward_logits

    params = init_causal_params(jax.random.PRNGKey(4), CAUSAL_TINY)
    qparams = quantize_causal_params(params)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(3, CAUSAL_TINY.vocab_size, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)
    full = np.asarray(forward_logits(params, CAUSAL_TINY, ids, mask))
    quant = np.asarray(forward_logits(qparams, CAUSAL_TINY, ids, mask))
    assert np.abs(full - quant).max() / full.std() < 0.2


def test_quantized_causal_engine_matches_quantized_classic():
    """int8 engine serving == int8 classic generate (lazy-append continuous
    batching must not change the quantized model's beams either)."""
    from reprover_tpu.generation.causal_generator import (
        CausalTacticGeneratorModel,
    )

    class IdsTokenizer:
        def __call__(self, text, add_special_tokens=True):
            return {"input_ids": [int(t) for t in text.split()]}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    params = init_causal_params(jax.random.PRNGKey(7), CAUSAL_TINY)
    model = CausalTacticGeneratorModel(
        params, CAUSAL_TINY, IdsTokenizer(), max_inp_seq_len=16,
        max_oup_seq_len=8, template="%s", bucket_multiple=4, quantize=True,
    )
    assert isinstance(model.params["lm_head"], QuantWeight)
    rng = np.random.default_rng(11)
    texts = [
        " ".join(str(int(t)) for t in rng.integers(3, CAUSAL_TINY.vocab_size, n))
        for n in (5, 9)
    ]
    classic = {t: model.generate([t], num_samples=4)[0] for t in texts}

    # engine quantizes internally from the RAW params — quantization is
    # deterministic, so its weights match the classic model's exactly
    engine = CausalTacticGeneratorModel(
        params, CAUSAL_TINY, IdsTokenizer(), max_inp_seq_len=16,
        max_oup_seq_len=8, template="%s", bucket_multiple=4,
    ).make_stepwise_engine(num_slots=2, num_beams=4, chunk_size=3, quantize=True)
    ids, mask = model.tokenize_for_engine(texts)
    engine.admit_batch_tokens([0, 1], ids, mask)
    got = {}
    for _ in range(32):
        if not engine.has_active():
            break
        engine.run_chunk()
        for slot in engine.finished_slots():
            seqs, scores, lens = engine.finalize(slot)
            got[slot] = model.decode_candidates(seqs, scores, lens)
    for slot, text in ((0, texts[0]), (1, texts[1])):
        want = classic[text]
        assert [t for t, _ in got[slot]] == [t for t, _ in want]
        np.testing.assert_allclose(
            [s for _, s in got[slot]], [s for _, s in want],
            rtol=1e-5, atol=1e-6,
        )


def test_quantized_t5_engine_matches_quantized_classic():
    from reprover_tpu.generation.generator import TacticGeneratorModel

    params = init_params(jax.random.PRNGKey(0), TINY)
    classic_model = TacticGeneratorModel(
        quantize_t5_params(params), TINY, max_inp_seq_len=64,
        max_oup_seq_len=8, bucket_multiple=32,
    )
    texts = ["⊢ 2 = 2", "n : ℕ ⊢ n + 0 = n"]
    classic = {t: classic_model.generate([t], num_samples=4)[0] for t in texts}

    raw_model = TacticGeneratorModel(
        params, TINY, max_inp_seq_len=64, max_oup_seq_len=8, bucket_multiple=32
    )
    engine = raw_model.make_stepwise_engine(
        num_slots=2, num_beams=4, chunk_size=3, quantize=True
    )
    ids, mask = raw_model.tokenize_for_engine(texts)
    engine.admit_batch_tokens([0, 1], ids, mask)
    got = {}
    for _ in range(32):
        if not engine.has_active():
            break
        engine.run_chunk()
        for slot in engine.finished_slots():
            seqs, scores, lens = engine.finalize(slot)
            got[slot] = raw_model.decode_candidates(seqs, scores, lens)
    for slot, text in ((0, texts[0]), (1, texts[1])):
        want = classic[text]
        assert [t for t, _ in got[slot]] == [t for t, _ in want]
        np.testing.assert_allclose(
            [s for _, s in got[slot]], [s for _, s in want],
            rtol=1e-5, atol=1e-6,
        )


# ------------------------------------------------------------------ #
# int4 (w4a16): pack/unpack round-trip, tree mapping, kernel, engines
# ------------------------------------------------------------------ #

from reprover_tpu.models.quantize import (
    Quant4Weight,
    dequantize4,
    quantize_weight4,
)


def test_quantize_weight4_roundtrip_bound():
    rng = np.random.default_rng(21)
    w = jnp.asarray(rng.normal(size=(256, 48)), jnp.float32)
    qw = quantize_weight4(w, group=64)
    assert qw.q.dtype == jnp.uint8 and qw.q.shape == (128, 48)
    assert qw.scale.shape == (4, 48) and qw.group == 64
    recon = np.asarray(dequantize4(qw))
    # per-group absmax / 7 is the quantization step; round-to-nearest
    # bounds the error at half a step per element
    grp = np.asarray(w).reshape(4, 64, 48)
    step = np.abs(grp).max(axis=1, keepdims=True) / 7.0
    err = np.abs(recon.reshape(4, 64, 48) - grp)
    assert (err <= step * 0.5 + 1e-6).all()


def test_quantize_weight4_group_falls_back_to_divisor():
    # byt5-small's d_model (1472) is not divisible by 128; the group size
    # halves to the largest divisor (64) instead of failing
    w = jnp.zeros((1472, 8), jnp.float32)
    qw = quantize_weight4(w, group=128)
    assert qw.group == 64 and qw.scale.shape == (23, 8)
    # K > 2048 additionally demands K % (8*group) == 0 so the Pallas
    # kernel has a legal K block (scale sublane rule): LLaMA-13B's
    # d_ff=13824 lands on 64, and 2304 on 32
    assert quantize_weight4(jnp.zeros((13824, 8)), group=128).group == 64
    assert quantize_weight4(jnp.zeros((2304, 8)), group=128).group == 32


def test_quantize_weight4_stacked_layer_axis():
    rng = np.random.default_rng(22)
    w = jnp.asarray(rng.normal(size=(3, 32, 8)), jnp.float32)
    w = w * jnp.asarray([1.0, 10.0, 100.0])[:, None, None]
    qw = quantize_weight4(w, group=16)
    assert qw.q.shape == (3, 16, 8) and qw.scale.shape == (3, 2, 8)
    recon = np.asarray(dequantize4(qw))
    for i, mag in enumerate((1.0, 10.0, 100.0)):
        step = np.abs(np.asarray(w[i])).max() / 7.0
        assert np.abs(recon[i] - np.asarray(w[i])).max() <= step * 0.5 + 1e-6


def test_quant4_dense_close_to_full():
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(size=(5, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 48)), jnp.float32)
    qw = quantize_weight4(w, group=32)
    full = np.asarray(x @ w)
    quant = np.asarray(quantized_dense(x, qw, jnp.float32))
    # int4 carries ~16x the step of int8 (measured max/std 0.44 at this
    # shape/seed); grouped scales keep the output error bounded by the
    # signal spread, not pointwise-tight like int8
    assert np.abs(quant - full).max() / np.abs(full).std() < 0.6
    assert np.median(np.abs(quant - full) / (np.abs(full) + 1e-3)) < 0.15
    # and exactly reproduces the dequantized reference (same path)
    ref = np.asarray(x) @ np.asarray(dequantize4(qw))
    np.testing.assert_allclose(quant, ref, atol=2e-4, rtol=1e-4)


def test_quantize_tree_bits4():
    params = init_params(jax.random.PRNGKey(0), TINY)
    qparams = quantize_t5_params(params, bits=4)
    assert isinstance(qparams["encoder"]["layers"]["attn"]["q"], Quant4Weight)
    assert isinstance(qparams["lm_head"], Quant4Weight)
    assert not isinstance(qparams["shared_embedding"], QuantWeight)
    # idempotent (Quant4Weight is a QuantWeight)
    q2 = quantize_t5_params(qparams, bits=4)
    assert q2["lm_head"] is qparams["lm_head"]
    # pytree round-trip preserves the static aux (group, kernel_ok)
    leaves, treedef = jax.tree_util.tree_flatten(qparams["lm_head"])
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.group == qparams["lm_head"].group


def test_pallas_quant4_matmul_interpret():
    """w4a16 kernel == dequantized XLA reference (interpret mode)."""
    from reprover_tpu.ops.quant_matmul import quant4_matmul

    rng = np.random.default_rng(24)
    for m, k, n, g in (
        (64, 1472, 384, 64),
        (8, 384, 1472, 128),
        (5, 256, 128, 128),
        (1100, 256, 512, 64),
        # K > 2048: the K-blocked accumulating grid (scratch + revisited
        # out tile) — 4096/128-group gives bk=1024 (4 K blocks); 2304
        # forces the group down to 32 (K % (8*group) rule) with bk=256
        (16, 4096, 256, 128),
        (4, 2304, 128, 128),
    ):
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        qw = quantize_weight4(w, group=g)
        ref = np.asarray(x) @ np.asarray(dequantize4(qw))
        out = np.asarray(
            quant4_matmul(
                x, qw.q, qw.scale, group=qw.group, interpret=True
            )
        )
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_int4_t5_engine_matches_int4_classic():
    """int4 engine serving == int4 classic generate: continuous batching
    must not change the quantized model's beams at 4-bit either."""
    from reprover_tpu.generation.generator import TacticGeneratorModel

    params = init_params(jax.random.PRNGKey(0), TINY)
    classic_model = TacticGeneratorModel(
        quantize_t5_params(params, bits=4), TINY, max_inp_seq_len=64,
        max_oup_seq_len=8, bucket_multiple=32,
    )
    texts = ["⊢ 2 = 2", "n : ℕ ⊢ n + 0 = n"]
    classic = {t: classic_model.generate([t], num_samples=4)[0] for t in texts}

    raw_model = TacticGeneratorModel(
        params, TINY, max_inp_seq_len=64, max_oup_seq_len=8, bucket_multiple=32
    )
    engine = raw_model.make_stepwise_engine(
        num_slots=2, num_beams=4, chunk_size=3, quantize="int4"
    )
    ids, mask = raw_model.tokenize_for_engine(texts)
    engine.admit_batch_tokens([0, 1], ids, mask)
    got = {}
    for _ in range(32):
        if not engine.has_active():
            break
        engine.run_chunk()
        for slot in engine.finished_slots():
            seqs, scores, lens = engine.finalize(slot)
            got[slot] = raw_model.decode_candidates(seqs, scores, lens)
    for slot, text in ((0, texts[0]), (1, texts[1])):
        want = classic[text]
        assert [t for t, _ in got[slot]] == [t for t, _ in want]
        np.testing.assert_allclose(
            [s for _, s in got[slot]], [s for _, s in want],
            rtol=1e-5, atol=1e-6,
        )


def test_int4_causal_engine_matches_int4_classic():
    from reprover_tpu.generation.causal_generator import (
        CausalTacticGeneratorModel,
    )

    class IdsTokenizer:
        def __call__(self, text, add_special_tokens=True):
            return {"input_ids": [int(t) for t in text.split()]}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    params = init_causal_params(jax.random.PRNGKey(7), CAUSAL_TINY)
    model = CausalTacticGeneratorModel(
        params, CAUSAL_TINY, IdsTokenizer(), max_inp_seq_len=16,
        max_oup_seq_len=8, template="%s", bucket_multiple=4, quantize="int4",
    )
    assert isinstance(model.params["lm_head"], Quant4Weight)
    rng = np.random.default_rng(11)
    texts = [
        " ".join(str(int(t)) for t in rng.integers(3, CAUSAL_TINY.vocab_size, n))
        for n in (5, 9)
    ]
    classic = {t: model.generate([t], num_samples=4)[0] for t in texts}

    engine = CausalTacticGeneratorModel(
        params, CAUSAL_TINY, IdsTokenizer(), max_inp_seq_len=16,
        max_oup_seq_len=8, template="%s", bucket_multiple=4,
    ).make_stepwise_engine(
        num_slots=2, num_beams=4, chunk_size=3, quantize="int4"
    )
    ids, mask = model.tokenize_for_engine(texts)
    engine.admit_batch_tokens([0, 1], ids, mask)
    got = {}
    for _ in range(32):
        if not engine.has_active():
            break
        engine.run_chunk()
        for slot in engine.finished_slots():
            seqs, scores, lens = engine.finalize(slot)
            got[slot] = model.decode_candidates(seqs, scores, lens)
    for slot, text in ((0, texts[0]), (1, texts[1])):
        want = classic[text]
        assert [t for t, _ in got[slot]] == [t for t, _ in want]
        np.testing.assert_allclose(
            [s for _, s in got[slot]], [s for _, s in want],
            rtol=1e-5, atol=1e-6,
        )


def test_quantize_flag_strict():
    """The quantize flag is validated strictly at every serving entry
    point: only True / 'int8' / 'int4' are legal — truthy typos ('INT4',
    'w4a16', 'int16') must raise instead of silently serving int8."""
    import pytest

    from reprover_tpu.generation.engine import StepwiseBeamEngine
    from reprover_tpu.models.quantize import resolve_quantize_bits

    assert resolve_quantize_bits(True) == 8
    assert resolve_quantize_bits("int8") == 8
    assert resolve_quantize_bits("int4") == 4
    for bad in ("INT4", "w4a16", "int16", 1, "true"):
        with pytest.raises(ValueError):
            resolve_quantize_bits(bad)

    params = init_params(jax.random.PRNGKey(0), TINY)
    with pytest.raises(ValueError):
        StepwiseBeamEngine(
            params, TINY, num_slots=2, num_beams=4, max_src_len=32,
            max_decode_len=8, quantize="INT4",
        )


def test_kernel_routing_thresholds():
    """Big 2-D weights route to the Pallas kernel (when forced / on TPU);
    byt5-scale weights, stacked-layer slices, and VMEM-oversized
    activations never do."""
    from reprover_tpu.models import quantize as qz

    def uk(m, k, n, force):
        x = jax.ShapeDtypeStruct((m, k), jnp.bfloat16)
        w = QuantWeight(
            q=jax.ShapeDtypeStruct((k, n), jnp.int8),
            scale=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )
        old = qz.FORCE_KERNEL
        qz.FORCE_KERNEL = force
        try:
            return qz._use_kernel(x, w, jnp.bfloat16)
        finally:
            qz.FORCE_KERNEL = old

    # LLaMA-7B down-projection and lm_head: routed when forced on
    assert uk(512, 11008, 4096, True)
    assert uk(512, 4096, 32000, True)
    # same shapes, CPU backend + no force: XLA path
    assert not uk(512, 11008, 4096, None)
    # byt5-small's largest (d_model x d_ff): below the measured win line
    assert not uk(512, 1472, 3584, True)
    # activation too large for the kernel's whole-x VMEM residency
    assert not uk(4096 * 64, 4096, 32000, True)
