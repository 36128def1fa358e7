"""Fixed-shape batched beam search with HF `generate` score semantics.

The reference relies on HF beam search for both training-time validation
(`/root/reference/generation/model.py:180-188`) and the prover
(`/root/reference/prover/tactic_generator.py:213-224`) with
``do_sample=False``, ``early_stopping=False``, configurable
``length_penalty``, returning ``sequences_scores``. This module reproduces
those semantics exactly — verified token-for-token / score-for-score against
HF in ``tests/test_beam_search.py`` — as a single jit-able
``lax.while_loop`` with static shapes:

- beams tracked as ``[batch, num_beams]`` running sum-logprobs; step = one
  fused (decode, log-softmax, top-2K, select, finished-merge) program;
- finished hypotheses kept as a fixed ``[batch, num_beams]`` pool merged by
  top-k each step (equivalent to HF ``BeamHypotheses`` insert-and-pop);
- termination mirrors HF ``early_stopping=False``: a batch is done when its
  worst finished score can no longer be beaten by the best attainable
  continuation (`transformers/generation/beam_search.py:968-985` heuristic);
- scores are ``sum_logprobs / generated_len ** length_penalty`` with
  generated_len counting the EOS (HF ``generated_len = cur_len -
  decoder_prompt_len``).

The model plugs in through two callables, so the same search serves the T5
decoder, a causal LM, or a mocked step function in tests.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)


def topk_candidates(
    cand: jnp.ndarray, k2: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact top-``k2`` over the flattened (beam, token) candidates.

    ``cand`` is [B, K, V] (beam score + token logprob). Decomposed as a
    per-beam top-``min(k2, V)`` followed by a top-``k2`` over the K·min(k2,V)
    survivors — any global top-k2 candidate is within its own beam's top-k2,
    so this is EXACT, including tie order: ``lax.top_k`` breaks ties by
    lowest index, per-beam sorting keeps equal scores in token order, and
    the survivor layout is beam-major, so ties resolve (beam, token)-first
    exactly like the flat [B, K*V] top_k — while sorting K small rows
    instead of one K·V-wide row (V can be 32k+ for causal-LM vocabularies).

    Returns (scores [B, k2] descending, parent beam [B, k2], token [B, k2]).
    """
    B, K, V = cand.shape
    m = min(k2, V)
    s1, i1 = jax.lax.top_k(cand, m)  # [B, K, m]
    scores, pos = jax.lax.top_k(s1.reshape(B, K * m), k2)
    parent = pos // m
    token = jnp.take_along_axis(i1.reshape(B, K * m), pos, axis=1)
    return scores, parent, token


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BeamSearchResult:
    """sequences [B, K, T] (start token first, EOS included when emitted,
    padded with pad_id), scores [B, K] (normalized, descending), and
    lengths [B, K] (token count incl. start and EOS)."""

    sequences: jnp.ndarray
    scores: jnp.ndarray
    lengths: jnp.ndarray

    def tree_flatten(self) -> tuple[tuple[jnp.ndarray, ...], None]:
        return ((self.sequences, self.scores, self.lengths), None)

    @classmethod
    def tree_unflatten(cls, aux: None, children: tuple) -> "BeamSearchResult":
        return cls(*children)


def beam_search(
    step_fn: Callable[[Any, jnp.ndarray], Tuple[jnp.ndarray, Any]],
    reorder_fn: Callable[[Any, jnp.ndarray], Any],
    cache: Any,
    batch_size: int,
    num_beams: int,
    max_length: int,
    eos_id: int,
    pad_id: int,
    start_id: Any,  # int scalar or [batch] int array
    length_penalty: float = 0.0,
) -> BeamSearchResult:
    """Run beam search.

    ``step_fn(cache, tokens[B*K]) -> (logits[B*K, V] fp32, cache)`` feeds the
    token at the current position; ``reorder_fn(cache, flat_parent[B*K])``
    gathers per-beam incremental state after selection. ``max_length`` counts
    the decoder start token (HF convention). ``start_id`` may be a scalar
    (encoder-decoder: the decoder start token) or an ``[batch]`` array
    (decoder-only: each prompt's last real token).
    """
    B, K = batch_size, num_beams
    T = max_length
    start_id = jnp.broadcast_to(jnp.asarray(start_id, jnp.int32), (B,))

    def norm(sum_logprobs: jnp.ndarray, gen_len: jnp.ndarray) -> jnp.ndarray:
        if length_penalty == 0.0:
            return sum_logprobs
        return sum_logprobs / jnp.power(
            jnp.maximum(gen_len.astype(jnp.float32), 1.0), length_penalty
        )

    tokens0 = (
        jnp.full((B, K, T), pad_id, jnp.int32)
        .at[:, :, 0]
        .set(start_id[:, None])
    )
    state0 = dict(
        n=jnp.asarray(1, jnp.int32),  # current sequence length (incl. start)
        tokens=tokens0,
        last_token=jnp.tile(start_id[:, None], (1, K)),
        # Only beam 0 live initially so the first expansion is unique (HF
        # initializes beam scores to [0, -1e9, ...]).
        beam_scores=jnp.tile(
            jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1)
        ),
        fin_tokens=jnp.full((B, K, T), pad_id, jnp.int32),
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_lens=jnp.zeros((B, K), jnp.int32),
        done=jnp.zeros((B,), bool),
        cache=cache,
    )

    def cond(s):
        return (s["n"] < T) & ~jnp.all(s["done"])

    def body(s):
        n = s["n"]
        logits, cache = step_fn(s["cache"], s["last_token"].reshape(B * K))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]

        cand_scores, parent, token = topk_candidates(
            s["beam_scores"][:, :, None] + logp.reshape(B, K, V), 2 * K
        )  # [B, 2K] sorted
        is_eos = token == eos_id

        # --- continuing beams: best K non-eos candidates (in sorted order).
        cont_scores, cont_pos = jax.lax.top_k(
            jnp.where(is_eos, NEG_INF, cand_scores), K
        )
        cont_parent = jnp.take_along_axis(parent, cont_pos, axis=1)
        cont_token = jnp.take_along_axis(token, cont_pos, axis=1)

        new_tokens = jnp.take_along_axis(
            s["tokens"], cont_parent[:, :, None], axis=1
        )
        new_tokens = jax.lax.dynamic_update_slice_in_dim(
            new_tokens, cont_token[:, :, None], n, axis=2
        )

        # --- finished pool: eos candidates ranked < K join the pool.
        # Hypothesis tokens = parent prefix (eos appended for decoding);
        # generated_len counts the eos: cur_len - prompt = (n+1) - 1 = n.
        rank_ok = (
            jnp.arange(2 * K)[None, :] < K
        )  # HF: worse-than-top-K eos is dropped
        eos_new_scores = jnp.where(
            is_eos & rank_ok, norm(cand_scores, jnp.full_like(cand_scores, n)), NEG_INF
        )  # [B, 2K]
        eos_tokens = jnp.take_along_axis(s["tokens"], parent[:, :, None], axis=1)
        eos_tokens = jax.lax.dynamic_update_slice_in_dim(
            eos_tokens, jnp.full((B, 2 * K, 1), eos_id, jnp.int32), n, axis=2
        )  # [B, 2K, T]

        merged_scores = jnp.concatenate([s["fin_scores"], eos_new_scores], axis=1)
        merged_tokens = jnp.concatenate([s["fin_tokens"], eos_tokens], axis=1)
        merged_lens = jnp.concatenate(
            [s["fin_lens"], jnp.full((B, 2 * K), n + 1, jnp.int32)], axis=1
        )
        fin_scores, keep = jax.lax.top_k(merged_scores, K)
        fin_tokens = jnp.take_along_axis(merged_tokens, keep[:, :, None], axis=1)
        fin_lens = jnp.take_along_axis(merged_lens, keep, axis=1)

        # --- termination heuristic (early_stopping=False).
        num_fin = jnp.sum(fin_scores > NEG_INF, axis=1)
        best_attainable = norm(
            cand_scores[:, 0], jnp.full((B,), n, jnp.float32)
        )
        worst_fin = fin_scores[:, K - 1]
        newly_done = (num_fin >= K) & (worst_fin >= best_attainable)

        # --- reorder the incremental cache to follow the chosen parents.
        flat_parent = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * K + cont_parent
        ).reshape(B * K)
        cache = reorder_fn(cache, flat_parent)

        # Frozen batches keep their state (cache updates are harmless).
        done_b = s["done"]
        keep_old = lambda old, new: jnp.where(
            done_b.reshape((B,) + (1,) * (new.ndim - 1)), old, new
        )
        return dict(
            n=n + 1,
            tokens=keep_old(s["tokens"], new_tokens),
            last_token=keep_old(s["last_token"], cont_token),
            beam_scores=keep_old(s["beam_scores"], cont_scores),
            fin_tokens=keep_old(s["fin_tokens"], fin_tokens),
            fin_scores=keep_old(s["fin_scores"], fin_scores),
            fin_lens=keep_old(s["fin_lens"], fin_lens),
            done=done_b | newly_done,
            cache=cache,
        )

    s = jax.lax.while_loop(cond, body, state0)

    # Finalize: batches not done merge their running beams as hypotheses
    # (generated_len = n - 1, no eos — HF finalize semantics).
    n = s["n"]
    run_scores = jnp.where(
        s["done"][:, None], NEG_INF, norm(s["beam_scores"], jnp.full((B, K), n - 1, jnp.float32))
    )
    merged_scores = jnp.concatenate([s["fin_scores"], run_scores], axis=1)
    merged_tokens = jnp.concatenate([s["fin_tokens"], s["tokens"]], axis=1)
    merged_lens = jnp.concatenate(
        [s["fin_lens"], jnp.full((B, K), n, jnp.int32)], axis=1
    )
    scores, keep = jax.lax.top_k(merged_scores, K)
    sequences = jnp.take_along_axis(merged_tokens, keep[:, :, None], axis=1)
    lengths = jnp.take_along_axis(merged_lens, keep, axis=1)
    return BeamSearchResult(sequences=sequences, scores=scores, lengths=lengths)
