"""Device ops: pooling parity, masked top-k semantics."""

import numpy as np
import jax.numpy as jnp

from reprover_tpu.ops import cosine_topk, masked_mean_normalize, masked_topk


def test_masked_mean_normalize_matches_reference_formula():
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(3, 7, 5)).astype(np.float32)
    mask = np.ones((3, 7), dtype=np.int32)
    mask[1, 4:] = 0
    mask[2, 1:] = 0
    out = np.asarray(masked_mean_normalize(jnp.asarray(hidden), jnp.asarray(mask)))
    # Reference: (hidden * mask).sum / lens, then L2 norm
    # (`retrieval/model.py:107-114`).
    feats = (hidden * mask[:, :, None]).sum(axis=1) / mask.sum(axis=1, keepdims=True)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    np.testing.assert_allclose(out, feats, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_masked_mean_normalize_padding_invariance():
    """Extra padding must not change the embedding (bucketing correctness)."""
    rng = np.random.default_rng(1)
    h = rng.normal(size=(1, 4, 6)).astype(np.float32)
    m = np.ones((1, 4), np.int32)
    h_pad = np.concatenate([h, rng.normal(size=(1, 5, 6)).astype(np.float32)], axis=1)
    m_pad = np.concatenate([m, np.zeros((1, 5), np.int32)], axis=1)
    a = np.asarray(masked_mean_normalize(jnp.asarray(h), jnp.asarray(m)))
    b = np.asarray(masked_mean_normalize(jnp.asarray(h_pad), jnp.asarray(m_pad)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_masked_topk_excludes_masked():
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    mask = jnp.asarray([[0, 1, 1, 1]])
    vals, idxs = masked_topk(scores, mask, 2)
    np.testing.assert_array_equal(np.asarray(idxs), [[1, 2]])
    np.testing.assert_allclose(np.asarray(vals), [[0.8, 0.7]])


def test_masked_topk_underfull_returns_neg_inf():
    scores = jnp.asarray([[0.9, 0.8]])
    mask = jnp.asarray([[1, 0]])
    vals, _ = masked_topk(scores, mask, 2)
    assert np.asarray(vals)[0, 1] == -np.inf


def test_masked_topk_matches_filter_after_argsort():
    """Rank equivalence with the reference semantics (`common.py:299-326`)."""
    rng = np.random.default_rng(2)
    scores = rng.normal(size=(4, 50)).astype(np.float32)
    mask = rng.random((4, 50)) < 0.6
    mask[:, :10] = True  # ensure enough accessible
    k = 8
    vals, idxs = masked_topk(jnp.asarray(scores), jnp.asarray(mask), k)
    for b in range(4):
        order = np.argsort(-scores[b], kind="stable")
        expected = [i for i in order if mask[b, i]][:k]
        np.testing.assert_array_equal(np.asarray(idxs)[b], expected)


def test_cosine_topk_end_to_end():
    rng = np.random.default_rng(3)
    prem = rng.normal(size=(20, 8)).astype(np.float32)
    prem /= np.linalg.norm(prem, axis=1, keepdims=True)
    ctx = prem[[4, 11]] + 0.01 * rng.normal(size=(2, 8)).astype(np.float32)
    ctx /= np.linalg.norm(ctx, axis=1, keepdims=True)
    mask = np.ones((2, 20), bool)
    vals, idxs = cosine_topk(
        jnp.asarray(ctx), jnp.asarray(prem), jnp.asarray(mask), 1
    )
    np.testing.assert_array_equal(np.asarray(idxs)[:, 0], [4, 11])
    # Self-similarity dominates and similarity <= 1.
    assert np.all(np.asarray(vals) <= 1.0 + 1e-5)
