"""Token-level continuous batching for decoder-only (LLaMA-family) models.

The reference's vLLM role serves *decoder-only* checkpoints with the
``[GOAL]/[PROOFSTEP]`` template (`/root/reference/prover/proof_search.py:332-366`,
`generation/preprocess.py:30-37`). :class:`CausalStepwiseEngine` is that
role in-framework: the same slot-based run-until-event machinery as the T5
:class:`~reprover_tpu.generation.engine.StepwiseBeamEngine` (one flat
status+payload vector per dispatch, wave admissions, ride-along finalize)
with the decoder-only cache layout:

- the prompt's K/V are prefilled once per *slot* and shared across beams
  (mirroring the T5 engine's cross-cache trick — a K-fold saving over the
  classic path, which tiles the prompt cache per beam row);
- the decode-side K/V are per (slot, beam) and follow beam parents;
- attention is ONE softmax over the concatenated [prompt | decode |
  fresh-column] key set — the same key set as
  :func:`reprover_tpu.models.causal_lm.decode_step`'s full-cache
  attention, with the current column lazily appended instead of written
  (the write is folded into the beam-reorder matmul's epilogue);
- RoPE positions and cache columns are per-slot: prompts are LEFT-padded
  to the engine's ``max_src_len`` bucket, so the decode write column
  depends only on the slot's step counter.

Beam semantics are identical to the classic
:class:`~reprover_tpu.generation.causal_generator.CausalTacticGeneratorModel`
path (HF ``generate``): decoding starts from each prompt's last real
token, so returned sequences contain only generated tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from reprover_tpu.generation.engine import (
    NEG_INF,
    StepwiseEngineBase,
    _reorder_both,
    advance_beams,
)
from reprover_tpu.models.causal_lm import (
    CausalLMConfig,
    Params,
    _dense,
    _lm_logits,
    _merge,
    _rms_norm,
    _rope,
    _split,
    prefill,
)
from reprover_tpu.models.quantize import has_xla_int4 as _has_xla_int4


# ------------------------------------------------------------------ #
# Engine state
# ------------------------------------------------------------------ #


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CausalEngineState:
    """Device state of ``num_slots`` concurrent decoder-only beam searches.

    Shapes: S = slots, K = beams, T = max decode length (incl. the start
    token — the prompt's last real token), Cp = max_src_len - 1 prompt
    cache columns, Ld = layers, Hkv = KV heads, d = head_dim.
    """

    # caches
    prompt_k: jnp.ndarray  # [Ld, S, Hkv, Cp, d] — shared across beams
    prompt_v: jnp.ndarray  # [Ld, S, Hkv, Cp, d]
    prompt_bias: jnp.ndarray  # [S, Cp] fp32 additive (left-pad masking)
    dec_k: jnp.ndarray  # [Ld, S, K, Hkv, T, d] — per beam, reordered
    dec_v: jnp.ndarray  # [Ld, S, K, Hkv, T, d]
    pos0: jnp.ndarray  # [S] int32 — RoPE position of the start token
    # beam search state (same field names as the T5 EngineState — the
    # shared advance/finalize/status machinery is duck-typed on these)
    n: jnp.ndarray  # [S] int32
    tokens: jnp.ndarray  # [S, K, T] int32
    last_token: jnp.ndarray  # [S, K] int32
    beam_scores: jnp.ndarray  # [S, K] fp32
    fin_tokens: jnp.ndarray  # [S, K, T] int32
    fin_scores: jnp.ndarray  # [S, K] fp32
    fin_lens: jnp.ndarray  # [S, K] int32
    done: jnp.ndarray  # [S] bool
    active: jnp.ndarray  # [S] bool

    def tree_flatten(self) -> tuple[tuple[jnp.ndarray, ...], None]:
        return (
            tuple(getattr(self, f.name) for f in dataclasses.fields(self)),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux: None, children: tuple) -> "CausalEngineState":
        return cls(*children)


def init_causal_engine_state(
    cfg: CausalLMConfig, num_slots: int, num_beams: int,
    max_src_len: int, max_decode_len: int,
) -> CausalEngineState:
    S, K, T = num_slots, num_beams, max_decode_len
    ld, hkv, d = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    cp = max_src_len - 1
    dt = cfg.compute_dtype
    return CausalEngineState(
        prompt_k=jnp.zeros((ld, S, hkv, cp, d), dt),
        prompt_v=jnp.zeros((ld, S, hkv, cp, d), dt),
        prompt_bias=jnp.full((S, cp), NEG_INF, jnp.float32),
        dec_k=jnp.zeros((ld, S, K, hkv, T, d), dt),
        dec_v=jnp.zeros((ld, S, K, hkv, T, d), dt),
        pos0=jnp.zeros((S,), jnp.int32),
        n=jnp.ones((S,), jnp.int32),
        tokens=jnp.full((S, K, T), cfg.pad_token_id, jnp.int32),
        last_token=jnp.full((S, K), cfg.pad_token_id, jnp.int32),
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


def _causal_decode_step(
    params: Params, cfg: CausalLMConfig, state: CausalEngineState
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder step for every (slot, beam).

    Returns (logits [S, K, V] fp32, k_news, v_news [Ld, S, K, Hkv, 1, d]).

    Same math as :func:`reprover_tpu.models.causal_lm.decode_step` with the
    batch row generalized to (slot, beam) and the cache split into a shared
    prompt part and a per-beam decode part. LAZY APPEND: the fresh column
    is attended as an appended score and installed by the beam-reorder
    matmul's epilogue in ``causal_engine_step`` — a write inside the scan
    would force a full decode-cache copy per layer per step.
    """
    dt = cfg.compute_dtype
    S, K = state.last_token.shape
    T = state.dec_k.shape[4]
    H, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    G = H // Hkv
    scale = d ** -0.5

    pos = state.n - 1  # [S] decode index of the fed token
    rope_pos = state.pos0 + pos  # [S] — all beams of a slot share it

    h = params["embedding"].astype(dt)[state.last_token]  # [S,K,D]
    h = h.reshape(S * K, 1, -1)
    rope_positions = jnp.repeat(rope_pos, K)[:, None]  # [S*K, 1]

    valid_d = jnp.arange(T)[None, :] < pos[:, None]  # [S,T] strictly prior
    bias_d = jnp.where(valid_d, 0.0, NEG_INF).astype(jnp.float32)[
        :, None, None, None, :
    ]  # [S,1,1,1,T]
    bias_p = state.prompt_bias[:, None, None, None, :]  # [S,1,1,1,Cp]

    def layer(carry, inputs):
        hh = carry  # [S*K, 1, D]
        lp, pk, pv, dk, dv = inputs
        nrm = _rms_norm(hh, lp["input_norm"], cfg.rms_norm_eps)
        q = _split(_dense(nrm, lp["q"], dt), H, d)  # [S*K,H,1,d]
        k = _split(_dense(nrm, lp["k"], dt), Hkv, d)  # [S*K,Hkv,1,d]
        v = _split(_dense(nrm, lp["v"], dt), Hkv, d)
        q = _rope(q, rope_positions, cfg.rope_theta)
        k = _rope(k, rope_positions, cfg.rope_theta)

        qg = q.reshape(S, K, H, d).reshape(S, K, Hkv, G, d)
        kd = k.reshape(S, K, Hkv, 1, d)
        vd = v.reshape(S, K, Hkv, 1, d)

        # One softmax over [prompt | decode | fresh-column] keys — the
        # classic full-cache attention with the current column appended
        # instead of written (lazy append).
        sp = (
            jnp.einsum(
                "skhgd,shcd->skhgc", qg.astype(dt), pk.astype(dt),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias_p
        )  # [S,K,Hkv,G,Cp]
        sd = (
            jnp.einsum(
                "skhgd,skhcd->skhgc", qg.astype(dt), dk.astype(dt),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias_d
        )  # [S,K,Hkv,G,T]
        s_new = (
            jnp.einsum(
                "skhgd,skhcd->skhgc", qg.astype(dt), kd.astype(dt),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [S,K,Hkv,G,1] — distance-0 column, always valid
        cp = sp.shape[-1]
        probs = jax.nn.softmax(
            jnp.concatenate([sp, sd, s_new], axis=-1), axis=-1
        ).astype(dt)
        out = (
            jnp.einsum(
                "skhgc,shcd->skhgd", probs[..., :cp], pv.astype(dt),
                preferred_element_type=jnp.float32,
            )
            + jnp.einsum(
                "skhgc,skhcd->skhgd", probs[..., cp : cp + T], dv.astype(dt),
                preferred_element_type=jnp.float32,
            )
            + probs[..., cp + T :].astype(jnp.float32)  # [S,K,Hkv,G,1]
            * vd.astype(jnp.float32)  # [S,K,Hkv,1,d] -> broadcast [.,G,d]
        ).astype(dt)  # fp32 accumulate all parts, one cast

        out = out.reshape(S * K, H, 1, d)
        hh = hh + _dense(_merge(out), lp["o"], dt)
        nrm = _rms_norm(hh, lp["post_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(
            _dense(nrm, lp["gate"], dt).astype(jnp.float32)
        ).astype(dt)
        hh = hh + _dense(gate * _dense(nrm, lp["up"], dt), lp["down"], dt)
        return hh, (kd.astype(dk.dtype), vd.astype(dv.dtype))

    hh, (k_news, v_news) = jax.lax.scan(
        layer,
        h,
        (
            params["layers"],
            state.prompt_k,
            state.prompt_v,
            state.dec_k,
            state.dec_v,
        ),
        # unroll removes per-iteration scan cost (measured ~3 ms of the T5
        # engine step) — EXCEPT on the TP int4 path, where each unrolled
        # layer's XLA dequant temp is a distinct live HBM buffer (measured
        # chipless at 13B TP=2: 32.3 GB of temps; see has_xla_int4).
        unroll=not _has_xla_int4(params["layers"]),
    )
    hh = _rms_norm(hh, params["final_norm"], cfg.rms_norm_eps)
    logits = _lm_logits(params, cfg, hh[:, 0, :])  # [S*K, V] fp32
    return logits.reshape(S, K, -1), k_news, v_news


def causal_engine_step(
    params: Params, cfg: CausalLMConfig, state: CausalEngineState,
    length_penalty: float, reorder_mode: str = "auto",
) -> CausalEngineState:
    """Advance every active, unfinished slot by one token.

    ``reorder_mode``: see :func:`reprover_tpu.generation.engine.engine_step`
    — "auto" (default: einsum below ``AUTO_SCAN_CACHE_BYTES`` of KV cache,
    scan above), "einsum" (one-hot matmul), "gather" (Pallas DMA,
    single-device), or "scan" (layer-blocked in-place; single-copy loop
    carry — lets a loop-carried 13B-geometry int4 serving program run its
    full slot geometry on one 16 GB chip, and measured faster at 7B+)."""
    logits, k_news, v_news = _causal_decode_step(params, cfg, state)
    updates, cont_parent, frozen = advance_beams(
        state, logits, length_penalty, cfg.eos_token_id
    )
    pos = state.n - 1
    dec_k, dec_v = _reorder_both(
        state.dec_k, state.dec_v, k_news, v_news,
        cont_parent, frozen, pos, reorder_mode,
    )
    return dataclasses.replace(state, dec_k=dec_k, dec_v=dec_v, **updates)


# ------------------------------------------------------------------ #
# Host-facing engine
# ------------------------------------------------------------------ #


class CausalStepwiseEngine(StepwiseEngineBase):
    """Decoder-only continuous-batching beam-search engine.

    ``max_src_len`` is the LEFT-padded prompt bucket: every admission row
    must be [A, max_src_len] with the last column holding the prompt's
    final real token (the beam-search start token).
    """

    _bucket_cache_fields = ("dec_k", "dec_v")

    def __init__(
        self,
        params: Params,
        cfg: CausalLMConfig,
        num_slots: int,
        num_beams: int,
        max_src_len: int,
        max_decode_len: int,
        length_penalty: float = 0.0,
        chunk_size: int = 8,
        mesh: Any = None,
        step_buckets: Any = None,
        quantize: "bool | str" = False,
        reorder_mode: str = "auto",
    ) -> None:
        self.cfg = cfg
        if quantize:
            # Weight-only int8: near-lossless beams, half the weight HBM
            # stream — a 7B-class decoder (13.5 GB bf16) serves from ONE
            # 16 GB chip. Large matmuls route through the Pallas w8a16
            # kernel (reprover_tpu.ops.quant_matmul). Composes with TP
            # (int8 shards over the mesh like bf16, halving per-chip
            # weight HBM — a 13B-class model on TP=2); under a mesh the
            # kernel routing is off (kernel_ok=False: a pallas_call can't
            # be GSPMD-partitioned) and the int8 dot partitions normally.
            # quantize="int4": packed 4-bit weights + per-group scales
            # quarter the stream — 13B-class on ONE chip, no TP needed.
            # Composes with TP too (13B int4 at TP=2 frees ~7 GB/chip for
            # slots/beams): packed nibbles live on the K axis and the
            # per-group scale shares the weight's axis semantics, so the
            # spec builder shards q and scale in lockstep; kernel routing
            # is off under GSPMD like int8.
            from reprover_tpu.models.quantize import (
                quantize_causal_params,
                resolve_quantize_bits,
            )

            bits = resolve_quantize_bits(quantize)
            params = quantize_causal_params(
                params, kernel_ok=mesh is None, bits=bits
            )
        if mesh is not None:
            # Tensor-parallel serving over the mesh's `model` axis — the
            # decoder-only family is where >1-chip models are realistic
            # (vLLM `tensor_parallel_size`, `/root/reference/prover/proof_search.py:345`).
            tp = mesh.shape["model"]
            assert cfg.num_kv_heads % tp == 0 and cfg.d_ff % tp == 0, (
                f"tensor-parallel degree {tp} must divide num_kv_heads="
                f"{cfg.num_kv_heads} and d_ff={cfg.d_ff}"
            )
            from reprover_tpu.parallel.sharding import (
                causal_param_partition_specs,
                shard_pytree,
            )

            params = shard_pytree(
                params,
                causal_param_partition_specs(params, model_parallel=True),
                mesh,
            )
        super().__init__(
            params, num_slots, num_beams, max_src_len, max_decode_len,
            length_penalty, chunk_size, mesh=mesh, step_buckets=step_buckets,
            reorder_mode=reorder_mode,
        )

    # -- base hooks ---------------------------------------------------- #

    def _init_state(self) -> CausalEngineState:
        return init_causal_engine_state(
            self.cfg, self.num_slots, self.num_beams,
            self.max_src_len, self.max_decode_len,
        )

    def _state_shardings(self) -> CausalEngineState:
        """KV caches sharded over their KV-head axis (carrying the params'
        `model` split); beam bookkeeping replicated."""
        import dataclasses as dc

        from jax.sharding import NamedSharding, PartitionSpec as P

        m = self.mesh
        prompt_kv = NamedSharding(m, P(None, None, "model", None, None))
        dec_kv = NamedSharding(m, P(None, None, None, "model", None, None))
        rep = NamedSharding(m, P())
        shardings = {f.name: rep for f in dc.fields(CausalEngineState)}
        shardings.update(
            prompt_k=prompt_kv, prompt_v=prompt_kv,
            dec_k=dec_kv, dec_v=dec_kv,
        )
        return CausalEngineState(**shardings)

    def _step_program(
        self, params: Params, state: CausalEngineState
    ) -> CausalEngineState:
        return causal_engine_step(
            params, self.cfg, state, self.length_penalty,
            reorder_mode=self._reorder_mode(),
        )

    def _admit_program(
        self, params: Params, state: CausalEngineState,
        slots: Any, ids: Any, mask: Any,
    ) -> CausalEngineState:
        return causal_admit_program(
            params, self.cfg, self.num_slots, self.num_beams,
            state, slots, ids, mask,
        )


def causal_admit_program(
    params: Params,
    cfg: Any,
    num_slots: int,
    num_beams: int,
    state: CausalEngineState,
    slots: Any,
    ids: Any,
    mask: Any,
) -> CausalEngineState:
    """Wave admission in ONE program: prefill all prompts-but-last
    ([A, max_src_len-1]), scatter the per-slot prompt K/V and metadata
    via a one-hot mixing matrix, and arm the beams with each prompt's
    last token as the start token. Slot -1 rows are no-ops.

    Module-level with explicit ``(cfg, num_slots, num_beams)`` so offline
    validators (``benchmarks/aot_compile_check.py``) compile exactly the
    production program without duck-typing an engine instance."""
    S_, K_ = num_slots, num_beams
    dt = cfg.compute_dtype

    _, cache = prefill(
        params, cfg, ids[:, :-1], mask[:, :-1], max_decode_len=0
    )
    pk, pv = cache.k, cache.v  # [Ld, A, Hkv, Cp, d]
    pos0_a = cache.position  # [A] — RoPE position of the start token
    start_a = ids[:, -1]  # [A]
    pbias_a = jnp.where(mask[:, :-1].astype(bool), 0.0, NEG_INF).astype(
        jnp.float32
    )  # [A, Cp]

    M = jax.nn.one_hot(slots, S_, dtype=jnp.float32)  # [A,S]
    Mi = M.astype(jnp.int32)
    occ = M.sum(axis=0)  # [S] 0/1
    occ_b = occ.astype(bool)

    def scatter_prompt(old, new):  # new [Ld,A,Hkv,Cp,d]
        mixed = jnp.einsum("as,lahcd->lshcd", M.astype(dt), new)
        m = occ.reshape(1, S_, 1, 1, 1).astype(old.dtype)
        return old * (1 - m) + mixed.astype(old.dtype) * m

    prompt_bias = jnp.where(
        occ_b[:, None],
        jnp.einsum("as,ac->sc", M, pbias_a),
        state.prompt_bias,
    )
    pos0 = jnp.where(occ_b, (Mi * pos0_a[:, None]).sum(axis=0), state.pos0)
    start = (Mi * start_a[:, None]).sum(axis=0)  # [S]

    def reset(x, value):
        m = occ.reshape((S_,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return x * (1 - m) + jnp.asarray(value, x.dtype) * m

    beam0 = jnp.asarray([0.0] + [float(NEG_INF)] * (K_ - 1), jnp.float32)
    # Classic ``beam_search`` seeds tokens[..., 0] with the start token
    # (the prompt's last real token) — generated tokens begin at column
    # 1 and callers skip column 0 when decoding. (The T5 engine skips
    # this because its start token IS the pad id.)
    T_ = state.tokens.shape[2]
    tokens = reset(state.tokens, cfg.pad_token_id)
    col0 = jnp.arange(T_)[None, None, :] == 0
    tokens = jnp.where(
        occ_b[:, None, None] & col0, start[:, None, None], tokens
    )
    return dataclasses.replace(
        state,
        prompt_k=scatter_prompt(state.prompt_k, pk),
        prompt_v=scatter_prompt(state.prompt_v, pv),
        prompt_bias=prompt_bias,
        pos0=pos0,
        n=jnp.where(occ_b, 1, state.n),
        tokens=tokens,
        last_token=jnp.where(
            occ_b[:, None], start[:, None], state.last_token
        ),
        beam_scores=jnp.where(
            occ_b[:, None], beam0[None, :], state.beam_scores
        ),
        fin_tokens=reset(state.fin_tokens, cfg.pad_token_id),
        fin_scores=reset(state.fin_scores, float(NEG_INF)),
        fin_lens=reset(state.fin_lens, 0),
        done=jnp.where(occ_b, False, state.done),
        active=state.active | occ_b,
    )
