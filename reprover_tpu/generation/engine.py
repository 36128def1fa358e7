"""Token-level continuous batching: a slot-based stepwise beam engine.

The reference shares one vLLM ``AsyncLLMEngine`` across all prover actors —
requests join the running batch at *token* granularity
(`/root/reference/prover/proof_search.py:332-366`). The coalescing
:class:`~reprover_tpu.prover.service.InferenceService` approximates that at
*request* granularity: a request arriving mid-decode waits out the whole
64-beam decode (~0.3-0.4 s). This module closes the gap:

- the device state is ``num_slots`` independent beam searches (K beams
  each) advanced together by run-until-event programs (a ``while_loop``
  that exits the moment a slot newly finishes, or after a traced horizon);
- between programs the host admits arrival waves into free slots (one
  fused tokenize->encode->scatter dispatch) and emits finished slots from
  the finalize payload that rides along with each status — so a new
  request waits at most one program, and the common finish costs zero
  extra round trips;
- each slot has its own decode position: the current token's K/V are
  attended as a lazily-appended column and installed by the beam-reorder
  matmul's epilogue (the cache is touched exactly once per step), and the
  T5 relative-position bias is computed per slot, so slots at different
  depths coexist in one program;
- cross-attention K/V are stored once per *slot*, not per beam row (the
  classic path tiles the encoder output K times) — a 64x cross-cache saving
  at 64 beams, which is what makes many-slot engines fit in 16 GB.

Beam semantics are byte-identical to :mod:`reprover_tpu.generation.beam_search`
(HF ``generate``: do_sample=False, early_stopping=False heuristic, finished
pool merged by top-k, ``sum_logprobs / len**length_penalty`` scores) — the
step body is the same math with the scalar position generalized to a
``[num_slots]`` vector. Tested: staggered admissions reproduce the classic
results exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reprover_tpu.models.t5 import (
    Params,
    T5Config,
    _dense,
    _lm_logits,
    _split_heads,
    compute_position_bias,
    relative_position_bucket,
    rms_norm,
)

from reprover_tpu.generation.beam_search import topk_candidates

NEG_INF = jnp.float32(-1e9)


# ------------------------------------------------------------------ #
# Engine state
# ------------------------------------------------------------------ #


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EngineState:
    """Device state of ``num_slots`` concurrent beam searches.

    Shapes: S = slots, K = beams, T = max decode length (incl. start),
    Ld = decoder layers, Smax = encoder length bucket.
    """

    # decoder caches
    self_k: jnp.ndarray  # [Ld, S, K, H, T, d]
    self_v: jnp.ndarray  # [Ld, S, K, H, T, d]
    cross_k: jnp.ndarray  # [Ld, S, H, Smax, d] — shared across beams
    cross_v: jnp.ndarray  # [Ld, S, H, Smax, d]
    cross_bias: jnp.ndarray  # [S, 1, 1, Smax] fp32 additive
    # beam search state (per slot)
    n: jnp.ndarray  # [S] int32 — current length incl. start token
    tokens: jnp.ndarray  # [S, K, T] int32
    last_token: jnp.ndarray  # [S, K] int32
    beam_scores: jnp.ndarray  # [S, K] fp32
    fin_tokens: jnp.ndarray  # [S, K, T] int32
    fin_scores: jnp.ndarray  # [S, K] fp32
    fin_lens: jnp.ndarray  # [S, K] int32
    done: jnp.ndarray  # [S] bool — beam search finished
    active: jnp.ndarray  # [S] bool — slot occupied

    def tree_flatten(self) -> tuple[tuple[jnp.ndarray, ...], None]:
        return (
            tuple(getattr(self, f.name) for f in dataclasses.fields(self)),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux: None, children: tuple) -> "EngineState":
        return cls(*children)


def init_engine_state(
    params: Params, cfg: T5Config, num_slots: int, num_beams: int,
    max_src_len: int, max_decode_len: int,
) -> EngineState:
    S, K, T = num_slots, num_beams, max_decode_len
    ld, h, d = cfg.num_decoder_layers, cfg.num_heads, cfg.d_kv
    dt = cfg.compute_dtype
    return EngineState(
        self_k=jnp.zeros((ld, S, K, h, T, d), dt),
        self_v=jnp.zeros((ld, S, K, h, T, d), dt),
        cross_k=jnp.zeros((ld, S, h, max_src_len, d), dt),
        cross_v=jnp.zeros((ld, S, h, max_src_len, d), dt),
        cross_bias=jnp.full((S, 1, 1, max_src_len), -1e10, jnp.float32),
        n=jnp.ones((S,), jnp.int32),
        tokens=jnp.full((S, K, T), cfg.pad_token_id, jnp.int32),
        last_token=jnp.full((S, K), cfg.decoder_start_token_id, jnp.int32),
        beam_scores=jnp.zeros((S, K), jnp.float32),
        fin_tokens=jnp.full((S, K, T), cfg.pad_token_id, jnp.int32),
        fin_scores=jnp.full((S, K), NEG_INF, jnp.float32),
        fin_lens=jnp.zeros((S, K), jnp.int32),
        done=jnp.zeros((S,), bool),
        active=jnp.zeros((S,), bool),
    )


# ------------------------------------------------------------------ #
# Decoder step with per-slot positions
# ------------------------------------------------------------------ #


def _grouped_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray, dtype: jnp.dtype
) -> jnp.ndarray:
    """q [S,K,H,1,d] x per-slot kv [S,H,Tk,d] (+bias broadcast) -> [S,K,H,1,d]."""
    scores = jnp.einsum(
        "skhqd,shtd->skhqt", q.astype(dtype), k.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores + bias  # [S,1,1,1,Tk]-broadcastable fp32
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum(
        "skhqt,shtd->skhqd", probs, v.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _engine_decode_step(
    params: Params, cfg: T5Config, state: EngineState
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder step for every (slot, beam).

    Returns (logits [S, K, V] fp32, k_news, v_news [Ld, S, K, H, 1, d]).

    LAZY APPEND: the current token's K/V are NOT written into the cache
    here — a write inside the scan forces a full-cache copy per layer per
    step. Attention runs over the old cache (columns strictly before the
    current position) plus the fresh column as an appended score, and
    ``engine_step`` folds the column write into the beam-reorder matmul's
    epilogue, which rewrites the cache anyway.
    """
    dt = cfg.compute_dtype
    dec = params["decoder"]
    S, K = state.last_token.shape
    T = state.self_k.shape[4]
    H, d = cfg.num_heads, cfg.d_kv
    pos = state.n - 1  # position of the token being fed

    h = params["shared_embedding"].astype(dt)[state.last_token]  # [S,K,D]
    h = h[:, :, None, :]  # [S,K,1,D]

    # Per-slot self-attention bias over the PRIOR positions.
    key_positions = jnp.arange(T)
    rel = key_positions[None, :] - pos[:, None]  # [S,T]
    buckets = relative_position_bucket(
        rel, False, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    self_bias = jnp.transpose(
        dec["rel_bias"][buckets], (0, 2, 1)
    ).astype(jnp.float32)[:, None, :, None, :]  # [S,1,H,1,T]
    valid = (key_positions[None, :] < pos[:, None])[:, None, None, None, :]
    self_bias = jnp.where(valid, self_bias, -1e10)
    # The appended (current) column sits at relative distance 0.
    bucket0 = relative_position_bucket(
        jnp.zeros((1, 1), jnp.int32), False,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )[0, 0]
    bias0 = dec["rel_bias"][bucket0].astype(jnp.float32).reshape(
        1, 1, H, 1, 1
    )
    cross_bias = state.cross_bias[:, None]  # [S,1,1,1,Smax]

    def layer(carry, inputs):
        hh = carry  # [S,K,1,D]
        lp, k_cache, v_cache, ck, cv = inputs
        eps = cfg.layer_norm_epsilon

        def proj(x, w):  # [S,K,1,D] @ [D,H*d] -> [S,K,H,1,d]
            y = _dense(x.reshape(S * K, 1, -1), w, dt)
            return _split_heads(y, H, d).reshape(S, K, H, 1, d)

        nrm = rms_norm(hh, lp["self_norm"], eps)
        q = proj(nrm, lp["self_attn"]["q"])
        k_new = proj(nrm, lp["self_attn"]["k"])  # [S,K,H,1,d]
        v_new = proj(nrm, lp["self_attn"]["v"])
        # Self-attention: old cache columns + the fresh column appended.
        s_cache = jnp.einsum(
            "skhqd,skhtd->skhqt", q.astype(dt), k_cache.astype(dt),
            preferred_element_type=jnp.float32,
        ) + self_bias
        s_new = jnp.einsum(
            "skhqd,skhtd->skhqt", q.astype(dt), k_new.astype(dt),
            preferred_element_type=jnp.float32,
        ) + bias0  # [S,K,H,1,1]
        probs = jax.nn.softmax(
            jnp.concatenate([s_cache, s_new], axis=-1), axis=-1
        ).astype(dt)
        attn = (
            jnp.einsum(
                "skhqt,skhtd->skhqd", probs[..., :T], v_cache.astype(dt),
                preferred_element_type=jnp.float32,
            )
            + probs[..., T:].astype(jnp.float32) * v_new.astype(jnp.float32)
        ).astype(dt)
        hh = hh + _dense(
            attn.transpose(0, 1, 3, 2, 4).reshape(S * K, 1, H * d),
            lp["self_attn"]["o"], dt,
        ).reshape(S, K, 1, -1)

        nrm = rms_norm(hh, lp["cross_norm"], eps)
        q = proj(nrm, lp["cross_attn"]["q"])
        attn = _grouped_attention(q, ck, cv, cross_bias, dt)
        hh = hh + _dense(
            attn.transpose(0, 1, 3, 2, 4).reshape(S * K, 1, H * d),
            lp["cross_attn"]["o"], dt,
        ).reshape(S, K, 1, -1)

        from reprover_tpu.models.t5 import _mlp_block

        hh = hh + _mlp_block(rms_norm(hh, lp["mlp_norm"], eps), lp["mlp"], cfg)
        return hh, (k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype))

    from reprover_tpu.models.quantize import has_xla_int4

    hh, (k_news, v_news) = jax.lax.scan(
        layer, h,
        (dec["layers"], state.self_k, state.self_v, state.cross_k, state.cross_v),
        # unroll removes per-iteration scan cost (few decoder layers) —
        # EXCEPT on the TP int4 path, where each unrolled layer's XLA
        # dequant temp is a distinct live HBM buffer (see has_xla_int4).
        unroll=not has_xla_int4(dec["layers"]),
    )
    hh = rms_norm(hh, dec["final_norm"], cfg.layer_norm_epsilon)
    logits = _lm_logits(params, cfg, hh.reshape(S * K, 1, -1))[:, 0, :]
    return logits.reshape(S, K, -1), k_news, v_news


# ------------------------------------------------------------------ #
# One beam-search step over all slots (per-slot n)
# ------------------------------------------------------------------ #


def _norm_scores(
    sum_logprobs: jnp.ndarray, gen_len: jnp.ndarray, length_penalty: float
) -> jnp.ndarray:
    if length_penalty == 0.0:
        return sum_logprobs
    return sum_logprobs / jnp.power(
        jnp.maximum(gen_len.astype(jnp.float32), 1.0), length_penalty
    )


def advance_beams(
    state: Any,
    logits: jnp.ndarray,
    length_penalty: float,
    eos_id: int,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Model-agnostic beam-search advance over all slots.

    Identical math to ``beam_search``'s loop body
    (`generation/beam_search.py:114-194`) with the scalar position ``n``
    vectorized to per-slot. ``state`` is any pytree with the beam fields
    (n, tokens, last_token, beam_scores, fin_*, done, active).

    Returns (updated beam fields incl. freezing, cont_parent [S, K] for the
    caller's per-beam cache reorder, frozen [S]).
    """
    S, K, T = state.tokens.shape
    n = state.n  # [S]

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    cand_scores, parent, token = topk_candidates(
        state.beam_scores[:, :, None] + logp, 2 * K
    )
    is_eos = token == eos_id

    cont_scores, cont_pos = jax.lax.top_k(
        jnp.where(is_eos, NEG_INF, cand_scores), K
    )
    cont_parent = jnp.take_along_axis(parent, cont_pos, axis=1)
    cont_token = jnp.take_along_axis(token, cont_pos, axis=1)

    write_oh = jax.nn.one_hot(n, T, dtype=jnp.int32)[:, None, :]  # [S,1,T]
    new_tokens = jnp.take_along_axis(state.tokens, cont_parent[:, :, None], axis=1)
    new_tokens = new_tokens * (1 - write_oh) + cont_token[:, :, None] * write_oh

    rank_ok = jnp.arange(2 * K)[None, :] < K
    eos_new_scores = jnp.where(
        is_eos & rank_ok,
        _norm_scores(cand_scores, n[:, None].astype(jnp.float32), length_penalty),
        NEG_INF,
    )
    eos_tokens = jnp.take_along_axis(state.tokens, parent[:, :, None], axis=1)
    eos_tokens = eos_tokens * (1 - write_oh) + eos_id * write_oh

    merged_scores = jnp.concatenate([state.fin_scores, eos_new_scores], axis=1)
    merged_tokens = jnp.concatenate([state.fin_tokens, eos_tokens], axis=1)
    merged_lens = jnp.concatenate(
        [state.fin_lens, jnp.tile((n + 1)[:, None], (1, 2 * K))], axis=1
    )
    fin_scores, keep = jax.lax.top_k(merged_scores, K)
    fin_tokens = jnp.take_along_axis(merged_tokens, keep[:, :, None], axis=1)
    fin_lens = jnp.take_along_axis(merged_lens, keep, axis=1)

    num_fin = jnp.sum(fin_scores > NEG_INF, axis=1)
    best_attainable = _norm_scores(
        cand_scores[:, 0], n.astype(jnp.float32), length_penalty
    )
    worst_fin = fin_scores[:, K - 1]
    newly_done = (num_fin >= K) & (worst_fin >= best_attainable)

    # Freeze finished, vacant, and length-capped slots (the classic loop's
    # ``n < T`` condition — chunked stepping would otherwise overshoot).
    frozen = state.done | ~state.active | (n >= T)  # [S]

    def keep_old(old, new):
        shape = [1] * new.ndim
        shape[0] = S
        return jnp.where(frozen.reshape(shape), old, new)

    updates = dict(
        n=jnp.where(frozen, n, n + 1),
        tokens=keep_old(state.tokens, new_tokens),
        last_token=keep_old(state.last_token, cont_token),
        beam_scores=keep_old(state.beam_scores, cont_scores),
        fin_tokens=keep_old(state.fin_tokens, fin_tokens),
        fin_scores=keep_old(state.fin_scores, fin_scores),
        fin_lens=keep_old(state.fin_lens, fin_lens),
        done=state.done | (state.active & newly_done),
    )
    return updates, cont_parent, frozen


def reorder_append(
    cache: jnp.ndarray,
    new_col: jnp.ndarray,
    cont_parent: jnp.ndarray,
    frozen: jnp.ndarray,
    pos: jnp.ndarray,
) -> jnp.ndarray:
    """Permute a per-beam cache [L, S, K, H, T, d] by beam parents AND
    install the current step's (never-written — lazy append) column in the
    same pass: the one-hot matmul moves rows at the memory roofline and
    the per-slot column select fuses into its epilogue, so the cache is
    touched exactly once per step."""
    S, K = cont_parent.shape
    T = cache.shape[4]
    parent_eff = jnp.where(
        frozen[:, None], jnp.arange(K)[None, :], cont_parent
    )
    P = jax.nn.one_hot(parent_eff, K, dtype=cache.dtype)  # [S, Knew, Kold]
    permuted = jnp.einsum("sij,lsjhtd->lsihtd", P, cache)
    # Each new beam row's appended column comes from its parent.
    col = jnp.einsum("sij,lsjhtd->lsihtd", P, new_col)  # [L,S,K,H,1,d]
    at_pos = (
        jnp.arange(T).reshape(1, 1, 1, 1, T, 1)
        == pos.reshape(1, S, 1, 1, 1, 1)
    )
    return jnp.where(at_pos, col, permuted)


def reorder_append_scan(
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    k_col: jnp.ndarray,
    v_col: jnp.ndarray,
    cont_parent: jnp.ndarray,
    frozen: jnp.ndarray,
    pos: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Layer-blocked :func:`reorder_append`: identical math, looped over
    the layer axis with in-place dynamic updates.

    The whole-cache einsum must double-buffer (a permutation can't be
    computed in place), so a loop-carried serving program holds 2x both
    caches — at LLaMA-13B geometry that is the difference between fitting
    a 16 GB chip and a runtime OOM (two 1.57 GB while-carry copies,
    measured 2026-08-19). Here each layer reorders via the same one-hot
    matmul into a layer-sized temp and is written back with
    ``dynamic_update_slice``, the canonical XLA in-place carry pattern, so
    the peak extra HBM is one layer (~40 MB at 13B) instead of a second
    full cache. Exactness: layer l's output depends only on layer l's
    input — sequential in-place update is safe; parity with the einsum
    path is pinned in `tests/test_beam_reorder.py`."""
    S, K = cont_parent.shape
    T = k_cache.shape[4]
    parent_eff = jnp.where(
        frozen[:, None], jnp.arange(K)[None, :], cont_parent
    )
    P = jax.nn.one_hot(parent_eff, K, dtype=k_cache.dtype)  # [S, Knew, Kold]
    at_pos = (
        jnp.arange(T).reshape(1, 1, 1, 1, T, 1)
        == pos.reshape(1, S, 1, 1, 1, 1)
    )

    def reorder_layer(layer, col):  # [1,S,K,H,T,d], [1,S,K,H,1,d]
        permuted = jnp.einsum("sij,lsjhtd->lsihtd", P, layer)
        colp = jnp.einsum("sij,lsjhtd->lsihtd", P, col)
        return jnp.where(at_pos, colp, permuted)

    def body(l, caches):
        kc, vc = caches
        kl = jax.lax.dynamic_slice_in_dim(kc, l, 1, axis=0)
        vl = jax.lax.dynamic_slice_in_dim(vc, l, 1, axis=0)
        kcol = jax.lax.dynamic_slice_in_dim(k_col, l, 1, axis=0)
        vcol = jax.lax.dynamic_slice_in_dim(v_col, l, 1, axis=0)
        kc = jax.lax.dynamic_update_slice_in_dim(
            kc, reorder_layer(kl, kcol), l, axis=0
        )
        vc = jax.lax.dynamic_update_slice_in_dim(
            vc, reorder_layer(vl, vcol), l, axis=0
        )
        return kc, vc

    return jax.lax.fori_loop(0, k_cache.shape[0], body, (k_cache, v_cache))


REORDER_MODES = ("auto", "einsum", "gather", "scan")

#: ``reorder_mode="auto"`` threshold: total self-KV cache bytes at or above
#: which the layer-blocked in-place reorder ("scan") replaces the whole-cache
#: one-hot einsum. Measured on v5e (benchmarks/causal7b_serve.py, 2026-08-19):
#: at 7B-int4 geometry (~2.1 GB of caches) scan is 1.10x faster than einsum
#: (99.4 vs 109.8 ms/step) AND keeps the loop-carried decode program to ONE
#: cache copy — at 13B geometry the einsum's while-carry double-buffer is a
#: runtime OOM (17.44 > 15.75 GB) where scan runs. Below the threshold the
#: einsum is the measured winner (byt5-scale reorder 2.99 ms/step vs the
#: gather's 5.56; the scan's serialized layer loop has no upside when the
#: whole cache fits comfortably).
AUTO_SCAN_CACHE_BYTES = 1 << 30


def resolve_reorder_mode(reorder_mode: str, total_cache_bytes: int) -> str:
    """Resolve ``"auto"`` to a concrete reorder mode from the total KV-cache
    footprint (static at trace time). See :data:`AUTO_SCAN_CACHE_BYTES`."""
    if reorder_mode != "auto":
        return reorder_mode
    return "scan" if total_cache_bytes >= AUTO_SCAN_CACHE_BYTES else "einsum"


def _reorder_both(
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    k_col: jnp.ndarray,
    v_col: jnp.ndarray,
    cont_parent: jnp.ndarray,
    frozen: jnp.ndarray,
    pos: jnp.ndarray,
    reorder_mode: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch the per-beam cache reorder+append for both KV caches."""
    reorder_mode = resolve_reorder_mode(
        reorder_mode,
        k_cache.size * k_cache.dtype.itemsize
        + v_cache.size * v_cache.dtype.itemsize,
    )
    if reorder_mode == "gather":
        from reprover_tpu.ops.beam_reorder import reorder_append_gather

        return reorder_append_gather(
            k_cache, v_cache, k_col, v_col, cont_parent, frozen, pos
        )
    if reorder_mode == "scan":
        return reorder_append_scan(
            k_cache, v_cache, k_col, v_col, cont_parent, frozen, pos
        )
    assert reorder_mode == "einsum", (
        f"reorder_mode must be one of {REORDER_MODES}: {reorder_mode!r}"
    )
    return (
        reorder_append(k_cache, k_col, cont_parent, frozen, pos),
        reorder_append(v_cache, v_col, cont_parent, frozen, pos),
    )


def engine_step(
    params: Params, cfg: T5Config, state: EngineState, length_penalty: float,
    reorder_mode: str = "auto",
) -> EngineState:
    """Advance every active, unfinished slot by one token.

    ``reorder_mode`` selects the per-beam cache permutation:
    ``"auto"`` (default) resolves at trace time from the KV-cache footprint
    — ``"einsum"`` (one-hot matmul, ~300 GB/s effective on v5e,
    GSPMD-partitionable under a TP mesh) below
    :data:`AUTO_SCAN_CACHE_BYTES`, ``"scan"`` (layer-blocked in-place —
    single-copy loop carry AND measured faster at 7B+ geometry) at or
    above it; ``"gather"`` (Pallas scalar-prefetch DMA gather,
    `ops/beam_reorder.py`; single-device only) stays opt-in."""
    logits, k_news, v_news = _engine_decode_step(params, cfg, state)
    updates, cont_parent, frozen = advance_beams(
        state, logits, length_penalty, cfg.eos_token_id
    )
    pos = state.n - 1
    self_k, self_v = _reorder_both(
        state.self_k, state.self_v, k_news, v_news,
        cont_parent, frozen, pos, reorder_mode,
    )
    return dataclasses.replace(
        state, self_k=self_k, self_v=self_v, **updates
    )


# ------------------------------------------------------------------ #
# Host-facing engine
# ------------------------------------------------------------------ #


class StepwiseEngineBase:
    """Shared slot/beam machinery for continuous-batching engines.

    Owns the run-until-event / admission / finalize device programs and the
    asynchronous host API; subclasses provide the model-specific decode
    step (``_step_program``), wave-admission program (``_admit_program``),
    and blank state (``_init_state``) — every model family whose decode is
    "feed last token, get logits" plugs into the same serving loop.
    """

    #: State fields holding per-beam KV caches with a decode-length axis at
    #: position -2 ([L, S, K, H, T, d]) — the tensors ``step_buckets``
    #: length-slices. Subclasses with such caches override this.
    _bucket_cache_fields: Tuple[str, ...] = ()

    def __init__(
        self,
        params: Params,
        num_slots: int,
        num_beams: int,
        max_src_len: int,
        max_decode_len: int,
        length_penalty: float = 0.0,
        chunk_size: int = 8,
        mesh: Optional[jax.sharding.Mesh] = None,
        step_buckets: Optional[Sequence[int]] = None,
        reorder_mode: str = "auto",
    ) -> None:
        """``mesh`` enables tensor-parallel serving (the reference's vLLM
        ``tensor_parallel_size`` role, `/root/reference/prover/proof_search.py:345`):
        params are sharded with Megatron specs over the mesh's ``model``
        axis and the engine KV caches over their head axis, so one engine
        serves a model larger than a single chip's HBM. Subclasses shard
        ``params`` before calling here and provide ``_state_shardings``.

        ``step_buckets`` (ascending ints ending at ``max_decode_len``)
        enables length-bucketed stepping: each run-until-event chunk runs
        on the per-beam KV caches sliced to the smallest bucket covering
        the deepest possibly-working slot for the whole chunk (chosen
        host-side from a conservative fill bound), so beam-reorder and
        self-attention HBM traffic scale with actual decode depth instead
        of the max-length allocation. Exact — untouched columns are never
        read (attention masks ≥ position; frozen slots neither advance nor
        re-read their appended column). Costs one compiled chunk variant
        per bucket."""
        self.params = params
        self.num_slots = num_slots
        self.num_beams = num_beams
        self.max_src_len = max_src_len
        self.max_decode_len = max_decode_len
        self.length_penalty = length_penalty
        self.chunk_size = chunk_size
        self.mesh = mesh
        assert reorder_mode in REORDER_MODES, (
            f"reorder_mode must be one of {REORDER_MODES}: {reorder_mode!r}"
        )
        assert not (reorder_mode == "gather" and mesh is not None), (
            "the Pallas gather reorder is single-device (a pallas_call "
            "can't be GSPMD-partitioned); use einsum or scan under a mesh"
        )
        self.reorder_mode = reorder_mode
        if step_buckets is not None:
            step_buckets = tuple(int(b) for b in step_buckets)
            assert self._bucket_cache_fields, (
                type(self).__name__ + " has no bucketable caches"
            )
            assert all(
                a < b for a, b in zip(step_buckets, step_buckets[1:])
            ) and step_buckets[-1] == max_decode_len, (
                f"step_buckets must ascend and end at max_decode_len: "
                f"{step_buckets}"
            )
        self.step_buckets = step_buckets
        # Conservative host-side upper bound on each slot's fill n: bumped
        # by max_steps at every dispatch, reset on admit/finalize/release.
        # Actual n never exceeds it (a chunk advances a slot by at most
        # max_steps), so the bucket chosen from it always covers the chunk.
        self._n_ub = np.zeros(num_slots, np.int64)
        self._shardings = self._state_shardings() if mesh is not None else None
        self.state = self._place(self._init_state())
        self._build_programs()

    # -- subclass hooks ------------------------------------------------ #

    def _init_state(self) -> Any:
        raise NotImplementedError

    def _state_shardings(self) -> Any:
        """NamedSharding pytree matching the engine state (TP mode only)."""
        raise NotImplementedError

    def _place(self, state: Any) -> Any:
        if self._shardings is None:
            return state
        return jax.tree.map(jax.device_put, state, self._shardings)

    def _step_program(self, params: Params, state: Any) -> Any:
        """One decode+beam step over all slots (pure; traced under jit)."""
        raise NotImplementedError

    def _reorder_mode(self) -> str:
        """The per-beam cache reorder defaults to ``"auto"``: the one-hot
        einsum below :data:`AUTO_SCAN_CACHE_BYTES` of KV cache (measured
        round 4 at the engine shapes, benchmarks/reorder_microbench.py,
        real v5e: ~300 GB/s effective vs the Pallas scalar-prefetch
        gather's 157 — 2x — and it is the same program GSPMD partitions
        under a TP mesh), the layer-blocked in-place ``"scan"`` at or
        above it (single-copy loop carry — what lets a 13B-int4 loop run
        at its full slot geometry — and measured 1.10x faster than the
        einsum at 7B geometry); ``"gather"`` stays opt-in for
        re-measurement on future hardware."""
        return self.reorder_mode

    def _admit_program(
        self, params: Params, state: Any, slots: Any, ids: Any, mask: Any
    ) -> Any:
        """Install a tokenized arrival wave (pure; traced under jit)."""
        raise NotImplementedError

    # -- device programs ----------------------------------------------- #

    def _build_programs(self) -> None:
        T = self.max_decode_len
        step = self._step_program
        admit = self._admit_program

        # TP mode: pin the engine-state outputs to the head-sharded layout
        # (donation then reuses the input buffers; without explicit
        # out_shardings GSPMD may pick a different layout and silently
        # copy the caches every dispatch).
        repl = (
            jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
            if self.mesh is not None
            else None
        )
        sh = self._shardings

        def _finished(s: Any) -> jnp.ndarray:
            return s.active & (s.done | (s.n >= T))

        # Donate the engine state: at serving shapes the KV caches are
        # hundreds of MB, and without donation every chunk/admit call
        # double-buffers them in HBM.
        #
        # Run-until-event: advance every working slot until a slot *newly*
        # finishes (relative to entry — already-finished slots are frozen by
        # ``engine_step`` and must not stall the others while the host gets
        # around to emitting them) or ``max_steps`` elapse. Through a
        # high-latency transport one dispatch+status round trip per *event*
        # replaces one per chunk. ``max_steps`` is a traced scalar — one
        # compiled program serves every horizon.
        #
        # ``bucket`` (length-bucketed stepping) slices the per-beam KV
        # caches (``_bucket_cache_fields``, T axis at -2) to the bucket
        # ONCE per chunk, runs the whole while_loop on the short caches,
        # and writes the prefix back with an offset-0 dynamic_update_slice
        # into the donated full buffers — so reorder-append and
        # self-attention touch only the live prefix, and the slice/restore
        # overhead is paid per CHUNK, not per step (the round-3 per-step
        # variant spent more on slice+restore than the short caches saved).
        # The host picks the bucket from its conservative per-slot fill
        # bound (see ``dispatch_run``); frozen slots never advance nor
        # re-read their appended column, so leaving their deep columns
        # untouched is exact (``test_engine.py::
        # test_bucketed_engine_exact_parity``).
        fields = self._bucket_cache_fields

        def make_chunk(bucket: Optional[int]) -> Any:
            def chunk_fn(
                params, state: Any, max_steps: jnp.ndarray,
                release: jnp.ndarray,
            ) -> Tuple[Any, jnp.ndarray]:
                # Slots whose results were emitted via a ride-along payload
                # are released here, at the start of the next program — the
                # device state stays truthful without a dedicated free
                # dispatch.
                state = dataclasses.replace(
                    state,
                    active=state.active & ~release,
                    done=state.done & ~release,
                )
                fin0 = _finished(state)
                full = state
                if bucket is not None and bucket < T:
                    state = dataclasses.replace(
                        state,
                        **{
                            f: jax.lax.slice_in_dim(
                                getattr(state, f), 0, bucket, axis=-2
                            )
                            for f in fields
                        },
                    )

                def cond(carry):
                    s, i = carry
                    fin = _finished(s)
                    working = s.active & ~fin
                    return (
                        (i < max_steps) & working.any() & ~(fin & ~fin0).any()
                    )

                def body(carry):
                    s, i = carry
                    return step(params, s), i + 1

                out, steps = jax.lax.while_loop(
                    cond, body, (state, jnp.int32(0))
                )
                if bucket is not None and bucket < T:
                    zeros = (0,) * getattr(full, fields[0]).ndim
                    out = dataclasses.replace(
                        out,
                        **{
                            f: jax.lax.dynamic_update_slice(
                                getattr(full, f), getattr(out, f), zeros
                            )
                            for f in fields
                        },
                    )
                # ONE packed int32 status vector [3S+2]: a single host copy
                # per dispatch instead of four (each transfer pays the
                # transport's per-call overhead).
                #
                # The program just exited on (at most) one *new* finish
                # event — gather that slot's finalize payload and ship it
                # WITH the status, so the common finish path costs zero
                # extra round trips. Simultaneous multi-finishes fall back
                # to ``prefetch_finalize`` host-side.
                fin_new = _finished(out) & ~fin0
                f = jnp.where(fin_new.any(), jnp.argmax(fin_new), -1)
                g = jnp.maximum(f, 0)
                scores = jnp.concatenate(
                    [out.fin_scores[g], out.beam_scores[g]]
                )
                # EVERYTHING in one flat int32 vector (scores bitcast):
                # each separate D2H pays the transport's ~40 ms latency
                # floor, so one fetch per dispatch, not four.
                flat = jnp.concatenate(
                    [
                        out.active.astype(jnp.int32),
                        out.done.astype(jnp.int32),
                        out.n,
                        steps[None],
                        f[None],
                        out.n[g][None],
                        out.done[g].astype(jnp.int32)[None],
                        out.fin_lens[g],
                        jnp.concatenate(
                            [out.fin_tokens[g], out.tokens[g]], axis=0
                        ).reshape(-1),
                        jax.lax.bitcast_convert_type(scores, jnp.int32),
                    ]
                )
                return out, flat

            if sh is not None:
                return jax.jit(
                    chunk_fn, donate_argnums=(1,), out_shardings=(sh, repl)
                )
            return jax.jit(chunk_fn, donate_argnums=(1,))

        chunk_fn = make_chunk(None)
        self._chunk_fns = (
            {b: make_chunk(b) for b in self.step_buckets}
            if self.step_buckets is not None
            else None
        )

        @partial(jax.jit, donate_argnums=(1,))
        def admit_tokens_fn(params, state: Any, slots, ids, mask) -> Any:
            return admit(params, state, slots, ids, mask)

        if sh is not None:
            admit_tokens_fn = jax.jit(
                admit_tokens_fn.__wrapped__,
                donate_argnums=(1,),
                out_shardings=sh,
            )

        S_ = self.num_slots

        # Finalize gather + slot release in ONE program: three packed
        # outputs (int vector, token matrix, score vector) start their host
        # copies at dispatch; the slot is freed on device immediately so
        # in-flight run programs neither step it nor re-report its event.
        @partial(jax.jit, donate_argnums=(0,))
        def finalize_fn(
            state: Any, slot
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Any]:
            ints = jnp.concatenate(
                [
                    state.n[slot][None],
                    state.done[slot].astype(jnp.int32)[None],
                    state.fin_lens[slot],
                ]
            )  # [K+2]
            toks = jnp.concatenate(
                [state.fin_tokens[slot], state.tokens[slot]], axis=0
            )  # [2K,T]
            scores = jnp.concatenate(
                [state.fin_scores[slot], state.beam_scores[slot]]
            )  # [2K]
            idx = jnp.arange(S_) == slot
            new = dataclasses.replace(
                state,
                active=jnp.where(idx, False, state.active),
                done=jnp.where(idx, False, state.done),
            )
            return ints, toks, scores, new

        if sh is not None:
            finalize_fn = jax.jit(
                finalize_fn.__wrapped__,
                donate_argnums=(0,),
                out_shardings=(repl, repl, repl, sh),
            )

        self._chunk_fn = chunk_fn
        self._admit_tokens_fn = admit_tokens_fn
        self._finalize_fn = finalize_fn

    # -- host API ------------------------------------------------------ #

    def reset(self) -> None:
        """Reinstall a blank engine state (all slots vacant). Keeps the
        compiled programs — used by the serving loop's crash containment."""
        self.state = self._place(self._init_state())
        self._n_ub[:] = 0

    def dispatch_run(
        self, max_steps: int, release: Optional[np.ndarray] = None
    ) -> jnp.ndarray:
        """Dispatch one run-until-event program (async) and return the flat
        device status+payload vector (see ``unpack_status``) with its host
        copy already in flight — the serving loop retires it a dispatch
        later, overlapping the round trip with the next program's compute.

        ``release`` marks slots whose results were already emitted from a
        ride-along payload; the program clears their active/done flags
        before stepping (so engine accessors are truthful after the next
        dispatch, with no dedicated free dispatch)."""
        if release is None:
            release = np.zeros((self.num_slots,), bool)
        # np arrays, not jnp: an eager device_put blocks until the copy
        # lands (behind any queued compute); the jit call enqueues host
        # args asynchronously.
        fn = self._chunk_fn
        if self._chunk_fns is not None:
            # Released slots stop stepping at the top of this program.
            self._n_ub[np.asarray(release, bool)] = 0
            need = int(
                min(self.max_decode_len, self._n_ub.max() + max_steps)
            )
            bucket = next(b for b in self.step_buckets if b >= need)
            fn = self._chunk_fns[bucket]
            # Any slot that can step advances by at most max_steps.
            live = self._n_ub > 0
            self._n_ub[live] = np.minimum(
                self._n_ub[live] + max_steps, self.max_decode_len
            )
        self.state, status = fn(
            self.params, self.state, np.int32(max_steps), release
        )
        status.copy_to_host_async()
        return status

    def unpack_status(
        self, packed: Any
    ) -> Tuple[
        np.ndarray, np.ndarray, np.ndarray, int, int, Tuple[Any, Any, Any]
    ]:
        """Flat int32 vector -> (active, done, n, steps, finished_slot,
        finalize_handle).

        ``finished_slot`` is the slot whose finalize payload rode along
        with this status (-1 if the program exited on horizon/idle instead
        of a finish event); ``finalize_handle`` is its (ints, toks, scores)
        payload in ``finalize_prefetched`` layout."""
        arr = np.asarray(packed)
        S, K, T = self.num_slots, self.num_beams, self.max_decode_len
        p = 3 * S + 2
        ints = arr[p : p + K + 2]
        toks = arr[p + K + 2 : p + K + 2 + 2 * K * T].reshape(2 * K, T)
        scores = arr[p + K + 2 + 2 * K * T :].view(np.float32)
        return (
            arr[:S] != 0,
            arr[S : 2 * S] != 0,
            arr[2 * S : 3 * S],
            int(arr[3 * S]),
            int(arr[3 * S + 1]),
            (ints, toks, scores),
        )

    def admit_batch_tokens(
        self, slots: List[int], ids: Any, mask: Any
    ) -> None:
        """Admit a wave of tokenized requests in ONE dispatch.

        ``ids``/``mask`` are [A, max_src_len] host or device arrays; row i
        goes to ``slots[i]``. Rows with slot -1 are padding no-ops (their
        one-hot scatter row is zero), so callers can bucket A to a power of
        two for shape reuse."""
        assert ids.shape[1] == self.max_src_len, (
            f"admission rows must be padded to max_src_len={self.max_src_len}, "
            f"got {ids.shape[1]}"
        )
        # Pass host arrays straight into the jit call: the implicit
        # transfer is enqueued asynchronously, whereas an explicit
        # ``jnp.asarray`` BLOCKS until the copy lands — and copies queue
        # behind the pipelined run programs' compute (measured ~0.4 s per
        # admission wave through the tunnel).
        self.state = self._admit_tokens_fn(
            self.params,
            self.state,
            np.asarray(slots, np.int32),
            np.ascontiguousarray(ids),
            np.ascontiguousarray(mask),
        )
        for s in slots:
            if s >= 0:
                self._n_ub[s] = 1  # admission resets the slot to n=1

    def host_status(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One host fetch of (active, done, n).

        The serving loop runs once per chunk; through a high-latency
        transport (axon tunnel) each separate fetch is a full round trip,
        so free/active/finished queries all derive from this single get.
        """
        active, done, n = jax.device_get(
            (self.state.active, self.state.done, self.state.n)
        )
        # Writable copies: callers mark slots emitted/admitted host-side.
        return np.array(active), np.array(done), np.array(n)

    def free_slots(self) -> List[int]:
        active, _, _ = self.host_status()
        return [i for i in range(self.num_slots) if not active[i]]

    def has_active(self) -> bool:
        active, _, _ = self.host_status()
        return bool(active.any())

    def run_chunk(self) -> None:
        self.dispatch_run(self.chunk_size)

    def finished_slots(
        self, status: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
    ) -> List[int]:
        active, done, n = status if status is not None else self.host_status()
        return [
            i
            for i in range(self.num_slots)
            if active[i] and (done[i] or n[i] >= self.max_decode_len)
        ]

    def prefetch_finalize(self, slot: int) -> Tuple[jnp.ndarray, ...]:
        """ONE dispatch that gathers everything ``finalize_prefetched``
        needs for ``slot`` (three packed outputs, host copies started) and
        frees the slot on device; returns the handle. The serving loop
        calls this the moment a status shows the slot finished, so the
        copies ride along with the next dispatch's compute."""
        ints, toks, scores, self.state = self._finalize_fn(
            self.state, np.int32(slot)
        )
        self._n_ub[slot] = 0  # freed on device by the finalize program
        for a in (ints, toks, scores):
            a.copy_to_host_async()
        return (ints, toks, scores)

    def finalize(self, slot: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Extract (sequences [K,T], scores [K], lengths [K]) and free the slot.

        HF finalize semantics (`generation/beam_search.py:198-212`): slots
        that hit max length merge their running beams as hypotheses with
        generated_len = n - 1 and no EOS.
        """
        return self.finalize_prefetched(slot, self.prefetch_finalize(slot))

    def finalize_prefetched(
        self, slot: int, handle: Tuple[jnp.ndarray, ...]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Complete a ``prefetch_finalize`` handle: host-side hypothesis
        merge (HF semantics). The slot was already freed at prefetch."""
        K = self.num_beams
        ints, toks, scores = (np.asarray(a) for a in handle)
        n, done = int(ints[0]), bool(ints[1])
        fin_lens = ints[2:]
        fin_tokens, tokens = toks[:K], toks[K:]
        fin_scores, beam_scores = scores[:K], scores[K:]
        if done:
            merged_scores, merged_tokens, merged_lens = (
                fin_scores, fin_tokens, fin_lens
            )
        else:
            # Host-side numpy (same math as _norm_scores): a jnp round trip
            # here would block the serving loop on the device per emit.
            lp = self.length_penalty
            if lp == 0.0:
                run_scores = beam_scores
            else:
                run_scores = (
                    beam_scores
                    / np.float32(max(float(n - 1), 1.0)) ** np.float32(lp)
                ).astype(np.float32)
            merged_scores = np.concatenate([fin_scores, run_scores])
            merged_tokens = np.concatenate([fin_tokens, np.asarray(tokens)])
            merged_lens = np.concatenate(
                [fin_lens, np.full((K,), n, np.int32)]
            )
        keep = np.argsort(-merged_scores, kind="stable")[:K]
        return merged_tokens[keep], merged_scores[keep], merged_lens[keep]


class StepwiseBeamEngine(StepwiseEngineBase):
    """T5 continuous-batching beam-search engine over ``num_slots`` slots.

    The encoder output enters as per-slot cross K/V (stored once per slot,
    not per beam row — a K-fold cross-cache saving); the decoder self-KV is
    per (slot, beam) with per-slot positions.
    """

    _bucket_cache_fields = ("self_k", "self_v")

    def __init__(
        self,
        params: Params,
        cfg: T5Config,
        num_slots: int,
        num_beams: int,
        max_src_len: int,
        max_decode_len: int,
        length_penalty: float = 0.0,
        chunk_size: int = 8,
        mesh: Optional[jax.sharding.Mesh] = None,
        step_buckets: Optional[Sequence[int]] = None,
        quantize: "bool | str" = False,
        reorder_mode: str = "auto",
    ) -> None:
        self.cfg = cfg
        if quantize:
            # Weight-only int8 serving (near-lossless beams; halves the
            # weight HBM stream — a memory option at byt5 scale, a
            # bandwidth win for models whose weights bound the step).
            # Composes with TP: the spec builder mirrors QuantWeight
            # nodes; under a mesh the Pallas w8a16 routing is disabled
            # (kernel_ok=False — a pallas_call can't be GSPMD-partitioned)
            # and the int8 dot partitions like any XLA matmul.
            # quantize="int4" packs 4-bit weights with per-group scales
            # (quarter weight HBM). Also composes with TP: the packed
            # nibble axis is K and the per-group scale shares the weight's
            # axis semantics, so column splits shard O on both and row
            # splits shard K/2 and K/g in lockstep (spec builder mirrors
            # Quant4Weight leaves; kernel routing off under GSPMD).
            from reprover_tpu.models.quantize import (
                quantize_t5_params,
                resolve_quantize_bits,
            )

            bits = resolve_quantize_bits(quantize)
            params = quantize_t5_params(
                params, kernel_ok=mesh is None, bits=bits
            )
        if mesh is not None:
            # Tensor-parallel serving: Megatron column/row splits over the
            # mesh's `model` axis (the vLLM `tensor_parallel_size` role,
            # `/root/reference/prover/proof_search.py:345`).
            tp = mesh.shape["model"]
            assert cfg.num_heads % tp == 0 and cfg.d_ff % tp == 0, (
                f"tensor-parallel degree {tp} must divide num_heads="
                f"{cfg.num_heads} and d_ff={cfg.d_ff}"
            )
            from reprover_tpu.parallel.sharding import (
                param_partition_specs,
                shard_pytree,
            )

            params = shard_pytree(
                params,
                param_partition_specs(params, cfg, model_parallel=True),
                mesh,
            )
        super().__init__(
            params, num_slots, num_beams, max_src_len, max_decode_len,
            length_penalty, chunk_size, mesh=mesh, step_buckets=step_buckets,
            reorder_mode=reorder_mode,
        )

        def admit_fn(
            params, state: EngineState, slot, enc_hidden, enc_mask
        ) -> EngineState:
            """Install one pre-encoded request into ``slot`` (traced)."""
            dt = cfg.compute_dtype
            H, d = cfg.num_heads, cfg.d_kv

            def per_layer_cross(lp_):
                k = _split_heads(
                    _dense(enc_hidden.astype(dt), lp_["cross_attn"]["k"], dt), H, d
                )  # [1,H,Smax,d]
                v = _split_heads(
                    _dense(enc_hidden.astype(dt), lp_["cross_attn"]["v"], dt), H, d
                )
                return k, v

            ck, cv = jax.vmap(per_layer_cross)(params["decoder"]["layers"])
            upd = lambda full, new: jax.lax.dynamic_update_slice(
                full, new, (0, slot, 0, 0, 0)
            )
            S, K, T = state.tokens.shape
            oh = jax.nn.one_hot(slot, S, dtype=jnp.float32)

            def reset(x, value):
                m = oh.reshape((S,) + (1,) * (x.ndim - 1)).astype(x.dtype)
                return x * (1 - m) + jnp.asarray(value, x.dtype) * m

            beam0 = jnp.asarray([0.0] + [float(NEG_INF)] * (K - 1), jnp.float32)
            return dataclasses.replace(
                state,
                cross_k=upd(state.cross_k, ck),
                cross_v=upd(state.cross_v, cv),
                cross_bias=jax.lax.dynamic_update_slice(
                    state.cross_bias,
                    jnp.where(enc_mask.astype(bool), 0.0, -1e10).astype(
                        jnp.float32
                    )[None, None],
                    (slot, 0, 0, 0),
                ),
                n=jnp.where(oh.astype(bool), 1, state.n),
                tokens=reset(state.tokens, cfg.pad_token_id),
                last_token=reset(state.last_token, cfg.decoder_start_token_id),
                beam_scores=jnp.where(
                    oh[:, None].astype(bool), beam0[None, :], state.beam_scores
                ),
                fin_tokens=reset(state.fin_tokens, cfg.pad_token_id),
                fin_scores=reset(state.fin_scores, float(NEG_INF)),
                fin_lens=reset(state.fin_lens, 0),
                done=jnp.where(oh.astype(bool), False, state.done),
                active=jnp.where(oh.astype(bool), True, state.active),
            )

        if self._shardings is None:
            self._admit_fn = jax.jit(admit_fn, donate_argnums=(1,))
        else:
            self._admit_fn = jax.jit(
                admit_fn, donate_argnums=(1,), out_shardings=self._shardings
            )

    # -- base hooks ---------------------------------------------------- #

    def _init_state(self) -> EngineState:
        return init_engine_state(
            self.params, self.cfg, self.num_slots, self.num_beams,
            self.max_src_len, self.max_decode_len,
        )

    def _state_shardings(self) -> EngineState:
        """Head-axis sharding for the KV caches (they carry the params'
        `model` split); everything else — beam bookkeeping, biases — is
        tiny and replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        m = self.mesh
        head_kv = NamedSharding(m, P(None, None, None, "model", None, None))
        head_cross = NamedSharding(m, P(None, None, "model", None, None))
        rep = NamedSharding(m, P())
        shardings = {f.name: rep for f in dataclasses.fields(EngineState)}
        shardings.update(
            self_k=head_kv, self_v=head_kv, cross_k=head_cross,
            cross_v=head_cross,
        )
        return EngineState(**shardings)

    def _step_program(self, params: Params, state: EngineState) -> EngineState:
        return engine_step(
            params, self.cfg, state, self.length_penalty,
            reorder_mode=self._reorder_mode(),
        )

    def _admit_program(
        self, params: Params, state: EngineState, slots: Any, ids: Any, mask: Any
    ) -> EngineState:
        """Whole-arrival-wave admission in ONE program: T5-encode the token
        batch, project cross K/V, and scatter every arrival into its slot
        via a one-hot mixing matrix. Padding rows carry slot = -1, whose
        one-hot row is all zeros — a natural no-op."""
        from reprover_tpu.models.t5 import encode as t5_encode

        cfg = self.cfg
        S_, K_ = self.num_slots, self.num_beams
        dt = cfg.compute_dtype
        H, d = cfg.num_heads, cfg.d_kv
        L = ids.shape[1]
        enc = t5_encode(params, cfg, ids, mask)  # [A, L, D]

        def per_layer_cross(lp_):
            k = _split_heads(
                _dense(enc.astype(dt), lp_["cross_attn"]["k"], dt), H, d
            )  # [A,H,L,d]
            v = _split_heads(
                _dense(enc.astype(dt), lp_["cross_attn"]["v"], dt), H, d
            )
            return k, v

        ck, cv = jax.vmap(per_layer_cross)(
            params["decoder"]["layers"]
        )  # [Ld,A,H,L,d]
        M = jax.nn.one_hot(slots, S_, dtype=jnp.float32)  # [A,S]
        occ = M.sum(axis=0)  # [S] 0/1 — slots receiving an arrival

        def scatter_cross(old, new):  # new [Ld,A,H,L,d] -> [Ld,S,H,L,d]
            mixed = jnp.einsum("as,lahtd->lshtd", M.astype(dt), new)
            m = occ.reshape(1, S_, 1, 1, 1).astype(old.dtype)
            return old * (1 - m) + mixed.astype(old.dtype) * m

        bias_a = jnp.where(mask.astype(bool), 0.0, -1e10).astype(
            jnp.float32
        )  # [A,L]
        bias_s = jnp.einsum("as,al->sl", M, bias_a)  # [S,L]
        cross_bias = jnp.where(
            occ[:, None].astype(bool),
            bias_s,
            state.cross_bias.reshape(S_, L),
        ).reshape(S_, 1, 1, L)

        def reset(x, value):
            m = occ.reshape((S_,) + (1,) * (x.ndim - 1)).astype(x.dtype)
            return x * (1 - m) + jnp.asarray(value, x.dtype) * m

        occ_b = occ.astype(bool)
        beam0 = jnp.asarray([0.0] + [float(NEG_INF)] * (K_ - 1), jnp.float32)
        return dataclasses.replace(
            state,
            cross_k=scatter_cross(state.cross_k, ck),
            cross_v=scatter_cross(state.cross_v, cv),
            cross_bias=cross_bias,
            n=jnp.where(occ_b, 1, state.n),
            tokens=reset(state.tokens, cfg.pad_token_id),
            last_token=reset(state.last_token, cfg.decoder_start_token_id),
            beam_scores=jnp.where(
                occ_b[:, None], beam0[None, :], state.beam_scores
            ),
            fin_tokens=reset(state.fin_tokens, cfg.pad_token_id),
            fin_scores=reset(state.fin_scores, float(NEG_INF)),
            fin_lens=reset(state.fin_lens, 0),
            done=jnp.where(occ_b, False, state.done),
            active=state.active | occ_b,
        )

    # -- legacy single-request admission ------------------------------- #

    def admit(
        self, slot: int, enc_hidden: jnp.ndarray, enc_mask: jnp.ndarray
    ) -> None:
        """enc_hidden [1, Smax, D] (padded), enc_mask [1, Smax]."""
        self.state = self._admit_fn(
            self.params, self.state, jnp.asarray(slot, jnp.int32),
            enc_hidden, enc_mask,
        )
        self._n_ub[slot] = 1  # admission resets the slot to n=1
