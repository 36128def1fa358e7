"""PremiseRetriever: reindex pipeline, retrieval parity, mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reprover_tpu.data import Context, Pos
from reprover_tpu.models import init_params
from reprover_tpu.models.t5 import T5Config
from reprover_tpu.parallel import make_mesh
from reprover_tpu.retrieval.retriever import PremiseRetriever

TINY = T5Config(
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=1,
)


@pytest.fixture(scope="module")
def retriever():
    params = init_params(jax.random.PRNGKey(0), TINY)
    return PremiseRetriever(params, TINY, max_seq_len=256, bucket_multiple=32)


def test_reindex_and_staleness(retriever, toy_corpus):
    retriever.load_corpus(toy_corpus)
    assert retriever.embeddings_staled
    retriever.reindex_corpus(batch_size=4)
    assert not retriever.embeddings_staled
    emb = np.asarray(retriever.corpus_embeddings)
    assert emb.shape == (len(toy_corpus), TINY.d_model)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)
    # Re-calling without staleness is a no-op (same object).
    before = retriever.corpus_embeddings
    retriever.reindex_corpus(batch_size=4)
    assert retriever.corpus_embeddings is before
    # mark_stale forces re-embed.
    retriever.mark_stale()
    retriever.reindex_corpus(batch_size=4)
    np.testing.assert_allclose(
        np.asarray(retriever.corpus_embeddings), emb, rtol=1e-5, atol=1e-6
    )


def test_reindex_batch_order_invariance(toy_corpus):
    """Length-sorted bucketed batching must not change embeddings."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    r1 = PremiseRetriever(params, TINY, max_seq_len=256, bucket_multiple=32)
    r1.load_corpus(toy_corpus)
    r1.reindex_corpus(batch_size=2)  # many small batches
    r2 = PremiseRetriever(params, TINY, max_seq_len=256, bucket_multiple=32)
    r2.load_corpus(toy_corpus)
    r2.reindex_corpus(batch_size=64)  # one batch
    np.testing.assert_allclose(
        np.asarray(r1.corpus_embeddings),
        np.asarray(r2.corpus_embeddings),
        rtol=1e-4,
        atol=1e-5,
    )


def test_retrieve_matches_host_reference(retriever, toy_corpus):
    """Device path == Corpus.get_nearest_premises (reference semantics)."""
    retriever.load_corpus(toy_corpus)
    retriever.reindex_corpus(4)
    ctx = Context("d.lean", "gcd_self", Pos(5, 1), "n : ℕ\n⊢ gcd n n = n")
    premises, scores = retriever.retrieve(
        ctx.state, "d.lean", "gcd_self", Pos(5, 1), k=3
    )
    ctx_emb = retriever.encode_strings([ctx.serialize()])
    expected, expected_scores = toy_corpus.get_nearest_premises(
        np.asarray(retriever.corpus_embeddings), [ctx], ctx_emb, 3
    )
    assert premises == expected[0]
    np.testing.assert_allclose(scores, expected_scores[0], rtol=1e-5)


def test_retrieve_raises_when_too_few(retriever, toy_corpus):
    retriever.load_corpus(toy_corpus)
    with pytest.raises(ValueError):
        retriever.retrieve("⊢ True", "a.lean", "Nat.gcd", Pos(1, 1), k=2)


def test_retrieve_batch(retriever, toy_corpus):
    retriever.load_corpus(toy_corpus)
    ctxs = [
        Context("d.lean", "gcd_self", Pos(5, 1), "n : ℕ\n⊢ gcd n n = n"),
        Context("b.lean", "b_late_lemma", Pos(20, 1), "⊢ 1 = 1"),
    ]
    results, scores = retriever.retrieve_batch(ctxs, k=2)
    assert len(results) == 2 and all(len(r) == 2 for r in results)
    # b.lean query can only see a.lean premises + forall_true_iff.
    allowed = {"Nat.gcd", "Nat.gcd_zero_left", "Nat.gcd_succ", "Nat.mod_self",
               "forall_true_iff"}
    assert {p.full_name for p in results[1]} <= allowed


def test_retrieve_approximate_matches_exact_on_toy(toy_corpus):
    """approximate=True (lax.approx_max_k) returns the same premises as the
    exact path on a small corpus — the flag exists for the +42% QPS at 131k
    premises (BASELINE.md) with recall 0.99."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    exact = PremiseRetriever(params, TINY, max_seq_len=256, bucket_multiple=32)
    exact.load_corpus(toy_corpus)
    approx = PremiseRetriever(
        params, TINY, max_seq_len=256, bucket_multiple=32, approximate=True
    )
    approx.load_corpus(toy_corpus)
    ctx = Context("d.lean", "gcd_self", Pos(5, 1), "n : ℕ\n⊢ gcd n n = n")
    p_exact, s_exact = exact.retrieve(ctx.state, "d.lean", "gcd_self", Pos(5, 1), 3)
    p_approx, s_approx = approx.retrieve(ctx.state, "d.lean", "gcd_self", Pos(5, 1), 3)
    assert set(p.full_name for p in p_approx) == set(p.full_name for p in p_exact)
    np.testing.assert_allclose(sorted(s_approx), sorted(s_exact), rtol=1e-5)


def test_sharded_reindex_matches_single_device(toy_corpus):
    """8-way CPU mesh reindex == unsharded reindex (embed-then-all-gather)."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.shape["data"] == 8
    r_mesh = PremiseRetriever(
        params, TINY, max_seq_len=256, mesh=mesh, bucket_multiple=32
    )
    r_mesh.load_corpus(toy_corpus)
    r_mesh.reindex_corpus(batch_size=8)
    r_single = PremiseRetriever(params, TINY, max_seq_len=256, bucket_multiple=32)
    r_single.load_corpus(toy_corpus)
    r_single.reindex_corpus(batch_size=8)
    np.testing.assert_allclose(
        np.asarray(r_mesh.corpus_embeddings),
        np.asarray(r_single.corpus_embeddings),
        rtol=1e-4,
        atol=1e-5,
    )


def test_indexed_corpus_roundtrip_through_retriever(retriever, toy_corpus, tmp_path):
    retriever.load_corpus(toy_corpus)
    retriever.reindex_corpus(4)
    out = str(tmp_path / "idx")
    retriever.to_indexed_corpus().save(out)

    r2 = PremiseRetriever(retriever.params, TINY, max_seq_len=256)
    r2.load_corpus(out)
    assert not r2.embeddings_staled
    np.testing.assert_allclose(
        np.asarray(r2.corpus_embeddings),
        np.asarray(retriever.corpus_embeddings),
        rtol=1e-6,
    )
