"""Pallas encoder flash attention: numerical parity with the naive path
(interpret mode on the CPU mesh; compiled parity is exercised on TPU by
bench.py and the serving paths)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reprover_tpu.models.t5 import T5Config, encode, init_params

TINY = T5Config(
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=1,
)


def _run(cfg, L=256, B=3, mask_tail=True):
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    if mask_tail:
        mask = jnp.asarray((rng.random((B, L)) > 0.25), jnp.int32).at[:, :4].set(1)
    naive = encode(params, cfg, ids, mask)
    flash = encode(params, dataclasses.replace(cfg, flash_encoder=True), ids, mask)
    return np.asarray(naive), np.asarray(flash)


def test_flash_matches_naive_with_padding():
    naive, flash = _run(TINY)
    np.testing.assert_allclose(naive, flash, atol=2e-5, rtol=1e-5)


def test_flash_matches_naive_full_mask():
    naive, flash = _run(TINY, mask_tail=False)
    np.testing.assert_allclose(naive, flash, atol=2e-5, rtol=1e-5)


def test_flash_long_distance_buckets():
    """Length > max_distance exercises the log-bucket branch."""
    cfg = dataclasses.replace(TINY, relative_attention_max_distance=32)
    naive, flash = _run(cfg, L=128)
    np.testing.assert_allclose(naive, flash, atol=2e-5, rtol=1e-5)


def test_flash_falls_back_on_unaligned_length():
    """L not a multiple of 128 silently uses the naive path."""
    cfg = dataclasses.replace(TINY, flash_encoder=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.ones((2, 100), jnp.int32)
    mask = jnp.ones((2, 100), jnp.int32)
    out = encode(params, cfg, ids, mask)  # must not raise
    assert out.shape == (2, 100, cfg.d_model)


def test_kernel_direct_vs_reference_math():
    """Drive the kernel directly against an einsum reference."""
    from reprover_tpu.ops.flash_attention import encoder_flash_attention

    B, H, L, d = 2, 4, 128, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.2), jnp.int32).at[:, 0].set(1)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)

    out = encoder_flash_attention(q, k, v, mask, rel, num_heads=H, interpret=True)

    # einsum reference with the composable-path helpers
    from reprover_tpu.models.t5 import (
        T5Config,
        _mask_bias,
        compute_position_bias,
    )

    cfg = T5Config(num_heads=H, d_kv=d)
    qh = q.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    pos = jnp.arange(L)
    bias = compute_position_bias(rel, pos, pos, True, cfg) + _mask_bias(mask)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    ref = (
        jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        .transpose(0, 2, 1, 3)
        .reshape(B, L, H * d)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
