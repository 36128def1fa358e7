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
    for m, k, n in ((64, 1472, 384), (8, 384, 1472), (5, 256, 128)):
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
