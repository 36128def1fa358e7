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


def _einsum_reference(q, k, v, mask, rel, H, d):
    from reprover_tpu.models.t5 import (
        T5Config,
        _mask_bias,
        compute_position_bias,
    )

    B, L = q.shape[0], q.shape[1]
    cfg = T5Config(num_heads=H, d_kv=d)
    qh = q.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    pos = jnp.arange(L)
    bias = compute_position_bias(rel, pos, pos, True, cfg) + _mask_bias(mask)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return (
        jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        .transpose(0, 2, 1, 3)
        .reshape(B, L, H * d)
    )


def test_kernel_gradients_vs_reference_math():
    """custom-VJP backward kernels == XLA autodiff of the einsum reference
    for dq/dk/dv and the relative-bias gradient."""
    from reprover_tpu.ops.flash_attention import encoder_flash_attention

    B, H, L, d = 2, 4, 256, 8
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.2), jnp.int32).at[:, 0].set(1)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)
    # Non-uniform cotangent so every gradient path is exercised.
    w = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)

    def loss_flash(q, k, v, rel):
        out = encoder_flash_attention(
            q, k, v, mask, rel, num_heads=H, interpret=True
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v, rel):
        return jnp.sum(_einsum_reference(q, k, v, mask, rel, H, d) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, rel)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for name, gf, gr in zip(("dq", "dk", "dv", "drel"), g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=1e-4, err_msg=name
        )


def test_kernel_multi_qblock_fwd_and_grad():
    """block_q < L forces multiple q-blocks: the persistent bias scratch
    must be rebuilt at each q-block's first batch cell (grid runs batch
    fastest) and the dS accumulator reset — a stale-scratch bug shows up
    only here, not in the single-block tests above."""
    from reprover_tpu.ops.flash_attention import encoder_flash_attention

    B, H, L, d = 3, 4, 256, 8
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.2), jnp.int32).at[:, 0].set(1)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)

    out = encoder_flash_attention(
        q, k, v, mask, rel, num_heads=H, block_q=128, interpret=True
    )
    ref = _einsum_reference(q, k, v, mask, rel, H, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )

    def loss_flash(q, k, v, rel):
        out = encoder_flash_attention(
            q, k, v, mask, rel, num_heads=H, block_q=128, interpret=True
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v, rel):
        return jnp.sum(_einsum_reference(q, k, v, mask, rel, H, d) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, rel)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for name, gf, gr in zip(("dq", "dk", "dv", "drel"), g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=1e-4, err_msg=name
        )


def test_kernel_forced_block_q():
    """``force_block_q=True`` bypasses the VMEM budget heuristic: at L=384
    the heuristic picks 128, a forced 384 must run one q-block and match.
    (The knob exists to sweep larger q-blocks at L=2304 on hardware, where
    the conservative budget under-blocks — see flash_kernel_bisect.py.)"""
    from reprover_tpu.ops.flash_attention import encoder_flash_attention

    B, H, L, d = 2, 4, 384, 8
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.2), jnp.int32).at[:, 0].set(1)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)

    forced = encoder_flash_attention(
        q, k, v, mask, rel, num_heads=H, block_q=384, force_block_q=True,
        interpret=True,
    )
    ref = _einsum_reference(q, k, v, mask, rel, H, d)
    np.testing.assert_allclose(
        np.asarray(forced), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_largest_divisor_block():
    """Blockwise block sizing: largest 128-multiple <= target dividing L;
    L itself when none (tiny interpret shapes)."""
    from reprover_tpu.ops.flash_attention import _largest_divisor_block

    assert _largest_divisor_block(2304, 512) == 384  # 512 ∤ 2304
    assert _largest_divisor_block(8192, 512) == 512
    assert _largest_divisor_block(1024, 1024) == 1024
    assert _largest_divisor_block(384, 512) == 384
    assert _largest_divisor_block(640, 512) == 128  # 256/384/512 all ∤ 640
    assert _largest_divisor_block(64, 512) == 64  # < 128: fall back to L


def test_blockwise_kernel_vs_reference_math():
    """KV-blocked online-softmax kernel (block_kv > 0): exact parity with
    the einsum reference at a length with near AND far KV blocks
    (max_distance=128, BK=128 at L=512 → q-block 0 sees blocks at
    distance >= 128 whose bias is the saturated per-head constant), and a
    fully masked tail block (the online rescale must zero its garbage)."""
    from reprover_tpu.ops.flash_attention import encoder_flash_attention

    B, H, L, d = 2, 4, 512, 8
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32).at[:, 352:].set(0)  # last block fully masked
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)

    out = encoder_flash_attention(
        q, k, v, mask, rel, num_heads=H, block_q=128, block_kv=128,
        interpret=True,
    )
    ref = _einsum_reference(q, k, v, mask, rel, H, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_blockwise_kernel_ragged_mask_and_grad():
    """Blockwise forward + BLOCKWISE backward (block_kv routes both): with
    BK=128 and max_distance=128 at L=384, q-block 0 × kv-block 2 is a far
    block, so dq/dk/dv AND the d_bias far-bucket scalar reduction are all
    exercised against autodiff of the einsum reference."""
    from reprover_tpu.ops.flash_attention import encoder_flash_attention

    B, H, L, d = 2, 4, 384, 8
    rng = np.random.default_rng(37)
    q = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.3), jnp.int32).at[:, 0].set(1)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, L, H * d)), jnp.float32)

    out = encoder_flash_attention(
        q, k, v, mask, rel, num_heads=H, block_q=128, block_kv=128,
        interpret=True,
    )
    ref = _einsum_reference(q, k, v, mask, rel, H, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )

    def loss_blockwise(q, k, v, rel):
        out = encoder_flash_attention(
            q, k, v, mask, rel, num_heads=H, block_q=128, block_kv=128,
            interpret=True,
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v, rel):
        return jnp.sum(_einsum_reference(q, k, v, mask, rel, H, d) * w)

    g_bw = jax.grad(loss_blockwise, argnums=(0, 1, 2, 3))(q, k, v, rel)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for name, gf, gr in zip(("dq", "dk", "dv", "drel"), g_bw, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=1e-4, err_msg=name
        )


def test_blockwise_causal_kernel_and_grad():
    """Causal blockwise (block_kv routes fwd AND bwd): BK=128 at T=384
    gives skipped all-future blocks, a diagonal block with the folded
    causal term, and a far-past block (saturated unidirectional bucket) —
    outputs and dq/dk/dv/drel must match autodiff of the causal einsum
    reference."""
    from reprover_tpu.ops.flash_attention import causal_flash_attention

    B, H, T, d = 2, 4, 384, 8
    rng = np.random.default_rng(41)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)

    out = causal_flash_attention(
        q, k, v, rel, num_heads=H, block_q=128, block_kv=128, interpret=True
    )
    ref = _causal_einsum_reference(q, k, v, rel, H, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )

    def loss_blockwise(q, k, v, rel):
        out = causal_flash_attention(
            q, k, v, rel, num_heads=H, block_q=128, block_kv=128,
            interpret=True,
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v, rel):
        return jnp.sum(_causal_einsum_reference(q, k, v, rel, H, d) * w)

    g_bw = jax.grad(loss_blockwise, argnums=(0, 1, 2, 3))(q, k, v, rel)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for name, gf, gr in zip(("dq", "dk", "dv", "drel"), g_bw, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=1e-4, err_msg=name
        )


def test_blockwise_scaled_causal_with_padding():
    """The LLaMA fine-tune form through the blockwise path: scale folded
    into q, right-padding key mask, causal — vs a plain einsum oracle."""
    from reprover_tpu.ops.flash_attention import scaled_causal_flash_attention

    B, H, T, d = 2, 4, 384, 8
    rng = np.random.default_rng(43)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    mask = jnp.ones((B, T), jnp.int32).at[1, 300:].set(0)
    scale = d ** -0.5

    out = scaled_causal_flash_attention(
        q, k, v, mask, num_heads=H, scale=scale, block_q=128, block_kv=128,
        interpret=True,
    )

    qh = q.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    pos = jnp.arange(T)
    ok = (pos[None, :] <= pos[:, None])[None, None] & mask[:, None, None, :].astype(bool)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    scores = jnp.where(ok, scores, -1e10)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = (
        jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        .transpose(0, 2, 1, 3)
        .reshape(B, T, H * d)
    )
    # compare real-query rows only (padded queries see garbage either way)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[1, :300]), np.asarray(ref[1, :300]), atol=2e-5, rtol=1e-5
    )


def test_model_flash_block_q_config():
    """cfg.flash_block_q forces the encoder kernel's q-block (128 at L=256
    where the heuristic picks 256) — encode output must match the naive
    path exactly as with the default blocking."""
    import dataclasses as dc

    cfg_forced = dc.replace(TINY, flash_encoder=True, flash_block_q=128)
    params = init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(23)
    B, L = 2, 256
    ids = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, L)), jnp.int32)
    mask = jnp.asarray((rng.random((B, L)) > 0.25), jnp.int32).at[:, :4].set(1)

    naive = encode(params, TINY, ids, mask)
    forced = encode(params, cfg_forced, ids, mask)
    np.testing.assert_allclose(
        np.asarray(forced), np.asarray(naive), atol=2e-5, rtol=1e-5
    )


def test_encoder_gradients_flash_vs_naive_under_remat():
    """Model-level: grad of a pooled loss through the flash encoder (with
    remat, the training configuration) matches the naive path."""
    import dataclasses as dc

    from reprover_tpu.ops import masked_mean_normalize

    cfg_naive = dc.replace(TINY, remat=True)
    cfg_flash = dc.replace(TINY, remat=True, flash_encoder=True)
    params = init_params(jax.random.PRNGKey(1), TINY)
    rng = np.random.default_rng(5)
    B, L = 2, 256
    ids = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, L)), jnp.int32)
    mask = jnp.asarray((rng.random((B, L)) > 0.25), jnp.int32).at[:, :4].set(1)

    def loss(params, cfg):
        emb = masked_mean_normalize(encode(params, cfg, ids, mask), mask)
        return jnp.sum(emb * emb[::-1])

    g_naive = jax.grad(loss)(params, cfg_naive)
    g_flash = jax.grad(loss)(params, cfg_flash)
    flat_n, _ = jax.tree_util.tree_flatten_with_path(g_naive)
    flat_f = jax.tree_util.tree_leaves(g_flash)
    for (path, gn), gf in zip(flat_n, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf),
            np.asarray(gn),
            atol=5e-5,
            rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


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


# ------------------------------------------------------------------ #
# Decoder kernels: causal self-attention + cross-attention
# ------------------------------------------------------------------ #


def _causal_einsum_reference(q, k, v, rel, H, d):
    from reprover_tpu.models.t5 import T5Config, compute_position_bias

    B, T = q.shape[0], q.shape[1]
    cfg = T5Config(num_heads=H, d_kv=d)
    qh = q.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    pos = jnp.arange(T)
    bias = compute_position_bias(rel, pos, pos, False, cfg)
    causal = (pos[None, :] <= pos[:, None])[None, None]
    bias = jnp.where(causal, bias, -1e10)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return (
        jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        .transpose(0, 2, 1, 3)
        .reshape(B, T, H * d)
    )


def test_causal_kernel_vs_reference_math():
    from reprover_tpu.ops.flash_attention import causal_flash_attention

    B, H, T, d = 2, 4, 256, 8
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)
    out = causal_flash_attention(q, k, v, rel, num_heads=H, interpret=True)
    ref = _causal_einsum_reference(q, k, v, rel, H, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_causal_kernel_gradients_vs_reference_math():
    from reprover_tpu.ops.flash_attention import causal_flash_attention

    B, H, T, d = 2, 4, 256, 8
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)

    def loss_flash(q, k, v, rel):
        out = causal_flash_attention(q, k, v, rel, num_heads=H, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v, rel):
        return jnp.sum(_causal_einsum_reference(q, k, v, rel, H, d) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, rel)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for name, gf, gr in zip(("dq", "dk", "dv", "drel"), g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=1e-4, err_msg=name
        )


def test_causal_long_distance_buckets():
    """T > max_distance exercises the unidirectional log-bucket branch."""
    from reprover_tpu.ops.flash_attention import causal_flash_attention

    B, H, T, d = 1, 2, 256, 8
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)
    out = causal_flash_attention(
        q, k, v, rel, num_heads=H, max_distance=32, interpret=True
    )

    from reprover_tpu.models.t5 import T5Config, compute_position_bias

    cfg = T5Config(num_heads=H, d_kv=d, relative_attention_max_distance=32)
    qh = q.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    pos = jnp.arange(T)
    bias = compute_position_bias(rel, pos, pos, False, cfg)
    bias = jnp.where((pos[None, :] <= pos[:, None])[None, None], bias, -1e10)
    probs = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) + bias, -1)
    ref = (
        jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        .transpose(0, 2, 1, 3)
        .reshape(B, T, H * d)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def _cross_einsum_reference(q, k, v, mask, H, d):
    from reprover_tpu.models.t5 import _mask_bias

    B, T = q.shape[0], q.shape[1]
    S = k.shape[1]
    qh = q.reshape(B, T, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) + _mask_bias(mask)
    probs = jax.nn.softmax(scores, axis=-1)
    return (
        jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        .transpose(0, 2, 1, 3)
        .reshape(B, T, H * d)
    )


def test_cross_kernel_vs_reference_math():
    """Rectangular (T != S) cross-attention with encoder padding."""
    from reprover_tpu.ops.flash_attention import cross_flash_attention

    B, H, T, S, d = 2, 4, 128, 384, 8
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H * d)), jnp.float32)
    mask = jnp.asarray((rng.random((B, S)) > 0.3), jnp.int32).at[:, 0].set(1)
    out = cross_flash_attention(q, k, v, mask, num_heads=H, interpret=True)
    ref = _cross_einsum_reference(q, k, v, mask, H, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_blockwise_cross_kernel_and_grad():
    """Rectangular (T != S) cross through the KV-blocked path: the
    blockwise kernel with a zero bias table IS cross-attention. Forward
    + gradients vs the einsum reference, with a fully masked tail block."""
    from reprover_tpu.ops.flash_attention import cross_flash_attention

    B, H, T, S, d = 2, 4, 256, 384, 8
    rng = np.random.default_rng(47)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H * d)), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32).at[:, 300:].set(0)
    w = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)

    out = cross_flash_attention(
        q, k, v, mask, num_heads=H, block_q=128, block_kv=128, interpret=True
    )
    ref = _cross_einsum_reference(q, k, v, mask, H, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )

    def loss_bw(q, k, v):
        out = cross_flash_attention(
            q, k, v, mask, num_heads=H, block_q=128, block_kv=128,
            interpret=True,
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_cross_einsum_reference(q, k, v, mask, H, d) * w)

    g_bw = jax.grad(loss_bw, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip(("dq", "dk", "dv"), g_bw, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=1e-4, err_msg=name
        )


def test_cross_kernel_gradients_vs_reference_math():
    from reprover_tpu.ops.flash_attention import cross_flash_attention

    B, H, T, S, d = 2, 4, 128, 384, 8
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H * d)), jnp.float32)
    mask = jnp.asarray((rng.random((B, S)) > 0.3), jnp.int32).at[:, 0].set(1)
    w = jnp.asarray(rng.normal(size=(B, T, H * d)), jnp.float32)

    def loss_flash(q, k, v):
        out = cross_flash_attention(q, k, v, mask, num_heads=H, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_cross_einsum_reference(q, k, v, mask, H, d) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip(("dq", "dk", "dv"), g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=1e-4, err_msg=name
        )


def test_decoder_flash_matches_naive_forward_loss_and_grads():
    """Model level: the full seq2seq training loss and parameter gradients
    match between flash_decoder and the naive decoder (remat on — the
    training configuration)."""
    import dataclasses as dc

    from reprover_tpu.models.t5 import forward_loss, init_params

    cfg_naive = dc.replace(TINY, remat=True)
    cfg_flash = dc.replace(TINY, remat=True, flash_decoder=True, flash_encoder=True)
    params = init_params(jax.random.PRNGKey(2), TINY)
    rng = np.random.default_rng(19)
    B, S, T = 2, 256, 128
    ids = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, S)), jnp.int32)
    mask = jnp.asarray((rng.random((B, S)) > 0.25), jnp.int32).at[:, :4].set(1)
    labels = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, T)), jnp.int32)
    labels = jnp.where(jnp.arange(T)[None, :] < 100, labels, -100)

    def loss(params, cfg):
        return forward_loss(params, cfg, ids, mask, labels)

    l_naive, g_naive = jax.value_and_grad(loss)(params, cfg_naive)
    l_flash, g_flash = jax.value_and_grad(loss)(params, cfg_flash)
    np.testing.assert_allclose(float(l_flash), float(l_naive), atol=1e-5, rtol=1e-5)
    flat_n, _ = jax.tree_util.tree_flatten_with_path(g_naive)
    flat_f = jax.tree_util.tree_leaves(g_flash)
    for (path, gn), gf in zip(flat_n, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf),
            np.asarray(gn),
            atol=1e-4,
            rtol=3e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_decoder_flash_falls_back_on_unaligned_length():
    """T or S not a multiple of 128 silently uses the naive decoder path."""
    import dataclasses as dc

    from reprover_tpu.models.t5 import forward_loss, init_params

    cfg = dc.replace(TINY, flash_decoder=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.ones((2, 100), jnp.int32)
    mask = jnp.ones((2, 100), jnp.int32)
    labels = jnp.ones((2, 50), jnp.int32)
    out = forward_loss(params, cfg, ids, mask, labels)  # must not raise
    assert out.shape == ()


def test_remat_lite_policy_matches_full():
    """remat_policy='lite' (save tagged intermediates) must be numerically
    identical to full remat — the policy changes what's saved, not math."""
    import dataclasses as dc

    from reprover_tpu.models.t5 import forward_loss, init_params

    cfg_full = dc.replace(TINY, remat=True, flash_encoder=True, flash_decoder=True)
    cfg_lite = dc.replace(cfg_full, remat_policy="lite")
    params = init_params(jax.random.PRNGKey(4), TINY)
    rng = np.random.default_rng(23)
    B, S, T = 2, 256, 128
    ids = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, S)), jnp.int32)
    mask = jnp.asarray((rng.random((B, S)) > 0.25), jnp.int32).at[:, :4].set(1)
    labels = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, T)), jnp.int32)

    def loss(params, cfg):
        return forward_loss(params, cfg, ids, mask, labels)

    l_full, g_full = jax.value_and_grad(loss)(params, cfg_full)
    l_lite, g_lite = jax.value_and_grad(loss)(params, cfg_lite)
    np.testing.assert_allclose(float(l_lite), float(l_full), rtol=1e-6)
    for gf, gl in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_lite)):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(gf), atol=1e-6, rtol=1e-5)


def test_remat_offload_policy_matches_full():
    """remat_policy='offload' (stream tagged intermediates to pinned host
    memory — the reference cpu_checkpointing role,
    /root/reference/retrieval/model.py:96-99) must be numerically identical
    to full remat: offload changes where activations live, not math."""
    import dataclasses as dc

    from reprover_tpu.models.t5 import forward_loss, init_params

    cfg_full = dc.replace(TINY, remat=True)
    cfg_off = dc.replace(cfg_full, remat_policy="offload")
    params = init_params(jax.random.PRNGKey(4), TINY)
    rng = np.random.default_rng(29)
    B, S, T = 2, 256, 128
    ids = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, S)), jnp.int32)
    mask = jnp.asarray((rng.random((B, S)) > 0.25), jnp.int32).at[:, :4].set(1)
    labels = jnp.asarray(rng.integers(3, TINY.vocab_size, (B, T)), jnp.int32)

    def loss(params, cfg):
        return forward_loss(params, cfg, ids, mask, labels)

    l_full, g_full = jax.jit(jax.value_and_grad(loss), static_argnums=1)(
        params, cfg_full
    )
    l_off, g_off = jax.jit(jax.value_and_grad(loss), static_argnums=1)(
        params, cfg_off
    )
    np.testing.assert_allclose(float(l_off), float(l_full), rtol=1e-6)
    for gf, go in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(go), np.asarray(gf), atol=1e-6, rtol=1e-5)
