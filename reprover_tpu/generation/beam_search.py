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

Diverse (grouped) beam search — HF ``num_beam_groups`` +
``diversity_penalty`` (Vijayakumar et al., the HF
``HammingDiversityLogitsProcessor`` + ``_group_beam_search`` semantics) —
is the same while_loop with the per-step selection split into ``G``
sequential groups of ``K/G`` beams: group ``g``'s log-probs are penalized
by ``diversity_penalty ×`` the per-token frequency of the tokens groups
``0..g-1`` just selected (done groups contribute ``pad`` tokens, mirroring
HF's dummy pads), each group keeps its own finished pool and done flag, and
finalize merges across groups. With ``num_beam_groups=1`` the loop is a
single group and the program is token-for-token the classic search.
Motivation (BASELINE.md round-5 attribution): plain beams spend their width
on per-character spelling variants of one candidate; Hamming groups force
the width onto genuinely different candidates.

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
    num_beam_groups: int = 1,
    diversity_penalty: float = 0.0,
) -> BeamSearchResult:
    """Run (optionally grouped/diverse) beam search.

    ``step_fn(cache, tokens[B*K]) -> (logits[B*K, V] fp32, cache)`` feeds the
    token at the current position; ``reorder_fn(cache, flat_parent[B*K])``
    gathers per-beam incremental state after selection. ``max_length`` counts
    the decoder start token (HF convention). ``start_id`` may be a scalar
    (encoder-decoder: the decoder start token) or an ``[batch]`` array
    (decoder-only: each prompt's last real token).

    ``num_beam_groups > 1`` enables HF diverse beam search: ``num_beams``
    must divide evenly; group ``g`` is penalized by ``diversity_penalty``
    per same-step token chosen by groups ``< g``.
    """
    B, K = batch_size, num_beams
    G = num_beam_groups
    if K % G != 0:
        raise ValueError(
            f"num_beams={K} must be divisible by num_beam_groups={G}"
        )
    Kg = K // G
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
    # Only the FIRST beam of each group live initially so each group's first
    # expansion is unique (HF initializes beam scores to 0 at ::group_size).
    scores_row = jnp.full((K,), NEG_INF, jnp.float32).at[::Kg].set(0.0)
    state0 = dict(
        n=jnp.asarray(1, jnp.int32),  # current sequence length (incl. start)
        tokens=tokens0,
        last_token=jnp.tile(start_id[:, None], (1, K)),
        beam_scores=jnp.tile(scores_row, (B, 1)),
        fin_tokens=jnp.full((B, K, T), pad_id, jnp.int32),
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_lens=jnp.zeros((B, K), jnp.int32),
        done=jnp.zeros((B, G), bool),  # per (batch, group), HF BeamHypotheses
        cache=cache,
    )

    def cond(s):
        return (s["n"] < T) & ~jnp.all(s["done"])

    def body(s):
        n = s["n"]
        logits, cache = step_fn(s["cache"], s["last_token"].reshape(B * K))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        logp = logp.reshape(B, K, V)

        # Per-step token frequency from earlier groups (Hamming diversity);
        # HF counts a done group's dummy pad selections too.
        freq = jnp.zeros((B, V), jnp.float32)
        pad_freq = jnp.zeros((V,), jnp.float32).at[pad_id].add(float(Kg))

        cont_scores_g, cont_parent_g, cont_token_g = [], [], []
        new_tokens_g, fin_scores_g, fin_tokens_g, fin_lens_g = [], [], [], []
        newly_done_g = []
        for g in range(G):  # static unroll; groups are sequential by design
            sl = slice(g * Kg, (g + 1) * Kg)
            logp_slice = logp[:, sl]
            if g > 0 and diversity_penalty > 0.0:
                logp_slice = logp_slice - diversity_penalty * freq[:, None, :]

            cand_scores, parent, token = topk_candidates(
                s["beam_scores"][:, sl, None] + logp_slice, 2 * Kg
            )  # [B, 2Kg] sorted
            is_eos = token == eos_id

            # --- continuing beams: best Kg non-eos candidates (sorted).
            cont_scores, cont_pos = jax.lax.top_k(
                jnp.where(is_eos, NEG_INF, cand_scores), Kg
            )
            cont_parent = jnp.take_along_axis(parent, cont_pos, axis=1)
            cont_token = jnp.take_along_axis(token, cont_pos, axis=1)

            toks = s["tokens"][:, sl]
            new_tokens = jnp.take_along_axis(
                toks, cont_parent[:, :, None], axis=1
            )
            new_tokens = jax.lax.dynamic_update_slice_in_dim(
                new_tokens, cont_token[:, :, None], n, axis=2
            )

            # --- finished pool: eos candidates ranked < Kg join the pool.
            # Hypothesis tokens = parent prefix (eos appended for decoding);
            # generated_len counts the eos: cur_len - prompt = (n+1) - 1 = n.
            rank_ok = (
                jnp.arange(2 * Kg)[None, :] < Kg
            )  # HF: worse-than-top-Kg eos is dropped
            eos_new_scores = jnp.where(
                is_eos & rank_ok,
                norm(cand_scores, jnp.full_like(cand_scores, n)),
                NEG_INF,
            )  # [B, 2Kg]
            eos_tokens = jnp.take_along_axis(toks, parent[:, :, None], axis=1)
            eos_tokens = jax.lax.dynamic_update_slice_in_dim(
                eos_tokens, jnp.full((B, 2 * Kg, 1), eos_id, jnp.int32), n, axis=2
            )  # [B, 2Kg, T]

            merged_scores = jnp.concatenate(
                [s["fin_scores"][:, sl], eos_new_scores], axis=1
            )
            merged_tokens = jnp.concatenate(
                [s["fin_tokens"][:, sl], eos_tokens], axis=1
            )
            merged_lens = jnp.concatenate(
                [s["fin_lens"][:, sl], jnp.full((B, 2 * Kg), n + 1, jnp.int32)],
                axis=1,
            )
            fin_scores, keep = jax.lax.top_k(merged_scores, Kg)
            fin_tokens = jnp.take_along_axis(
                merged_tokens, keep[:, :, None], axis=1
            )
            fin_lens = jnp.take_along_axis(merged_lens, keep, axis=1)

            # --- termination heuristic (early_stopping=False), per group.
            num_fin = jnp.sum(fin_scores > NEG_INF, axis=1)
            best_attainable = norm(
                cand_scores[:, 0], jnp.full((B,), n, jnp.float32)
            )
            worst_fin = fin_scores[:, Kg - 1]
            newly_done = (num_fin >= Kg) & (worst_fin >= best_attainable)

            if G > 1 and diversity_penalty > 0.0 and g < G - 1:
                picked = jax.nn.one_hot(cont_token, V, dtype=jnp.float32).sum(
                    axis=1
                )  # [B, V]
                freq = freq + jnp.where(
                    s["done"][:, g][:, None], pad_freq[None, :], picked
                )

            cont_scores_g.append(cont_scores)
            cont_parent_g.append(cont_parent + g * Kg)  # group-local → global
            cont_token_g.append(cont_token)
            new_tokens_g.append(new_tokens)
            fin_scores_g.append(fin_scores)
            fin_tokens_g.append(fin_tokens)
            fin_lens_g.append(fin_lens)
            newly_done_g.append(newly_done)

        cont_scores = jnp.concatenate(cont_scores_g, axis=1)  # [B, K]
        cont_parent = jnp.concatenate(cont_parent_g, axis=1)
        cont_token = jnp.concatenate(cont_token_g, axis=1)
        new_tokens = jnp.concatenate(new_tokens_g, axis=1)  # [B, K, T]
        fin_scores = jnp.concatenate(fin_scores_g, axis=1)
        fin_tokens = jnp.concatenate(fin_tokens_g, axis=1)
        fin_lens = jnp.concatenate(fin_lens_g, axis=1)
        newly_done = jnp.stack(newly_done_g, axis=1)  # [B, G]

        # --- reorder the incremental cache to follow the chosen parents.
        flat_parent = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * K + cont_parent
        ).reshape(B * K)
        cache = reorder_fn(cache, flat_parent)

        # Frozen (batch, group)s keep their state (cache updates harmless).
        done_k = jnp.repeat(s["done"], Kg, axis=1)  # [B, K]
        keep_old = lambda old, new: jnp.where(
            done_k.reshape((B, K) + (1,) * (new.ndim - 2)), old, new
        )
        return dict(
            n=n + 1,
            tokens=keep_old(s["tokens"], new_tokens),
            last_token=keep_old(s["last_token"], cont_token),
            beam_scores=keep_old(s["beam_scores"], cont_scores),
            fin_tokens=keep_old(s["fin_tokens"], fin_tokens),
            fin_scores=keep_old(s["fin_scores"], fin_scores),
            fin_lens=keep_old(s["fin_lens"], fin_lens),
            done=s["done"] | newly_done,
            cache=cache,
        )

    s = jax.lax.while_loop(cond, body, state0)

    # Finalize: (batch, group)s not done merge their running beams as
    # hypotheses (generated_len = n - 1, no eos — HF finalize semantics);
    # the best K across groups are returned (HF merges group pools).
    n = s["n"]
    done_k = jnp.repeat(s["done"], Kg, axis=1)  # [B, K]
    run_scores = jnp.where(
        done_k, NEG_INF, norm(s["beam_scores"], jnp.full((B, K), n - 1, jnp.float32))
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
