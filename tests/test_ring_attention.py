"""Ring attention (sequence parallel over the mesh) vs single-device
attention: exact numerical match including T5 position bias and padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from reprover_tpu.models.t5 import T5Config, _mask_bias, compute_position_bias
from reprover_tpu.ops.ring_attention import ring_encoder_attention


def _reference(q, k, v, mask, rel_bias, cfg):
    pos = jnp.arange(q.shape[2])
    bias = compute_position_bias(rel_bias, pos, pos, True, cfg) + _mask_bias(mask)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("seq",))


@pytest.mark.parametrize("masked", [False, True])
def test_ring_matches_single_device(mesh, masked):
    B, H, L, d = 2, 4, 64, 8
    cfg = T5Config(num_heads=H, d_kv=d)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    if masked:
        mask = jnp.asarray((rng.random((B, L)) > 0.3), jnp.int32).at[:, :2].set(1)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)

    out = ring_encoder_attention(q, k, v, mask, rel, mesh)
    ref = _reference(q, k, v, mask, rel, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_long_distance_buckets(mesh):
    """Length >> max_distance exercises the log-bucket branch across shards."""
    B, H, L, d = 1, 2, 256, 8
    cfg = T5Config(num_heads=H, d_kv=d, relative_attention_max_distance=32)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    rel = jnp.asarray(rng.normal(size=(32, H)), jnp.float32)

    out = ring_encoder_attention(
        q, k, v, mask, rel, mesh, max_distance=32
    )
    pos = jnp.arange(L)
    bias = compute_position_bias(rel, pos, pos, True, cfg) + _mask_bias(mask)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_encode_sequence_parallel_matches_encode(mesh):
    """Model-level SP encoder == single-device encoder, fused MLP included."""
    from reprover_tpu.models.t5 import (
        T5Config,
        encode,
        encode_sequence_parallel,
        fuse_mlp_params,
        init_params,
    )

    cfg = T5Config(
        d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=1,
    )
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B, L = 2, 64
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.asarray((rng.random((B, L)) > 0.2), jnp.int32).at[:, :2].set(1)
    ref = encode(params, cfg, ids, mask)
    sp = encode_sequence_parallel(params, cfg, ids, mask, mesh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(sp), atol=2e-5, rtol=2e-5)
