"""Functional decoder-only (LLaMA-family) causal LM in pure JAX.

The reference serves decoder-only tactic generators two ways: the
``HuggingFaceGenerator`` causal-LM fallback
(`/root/reference/prover/tactic_generator.py:187-192,237-238`) and vLLM with
the ``[GOAL]/[PROOFSTEP]`` template (`proof_search.py:332-366`,
`generation/preprocess.py:30-37`). This module provides the TPU-native model
those paths need: RMSNorm pre-norm, rotary position embeddings, grouped-query
attention, SwiGLU MLP — the LLaMA architecture family HF checkpoints use.

Same design rules as :mod:`reprover_tpu.models.t5`: pure functions + pytree
params, scanned layer stack, fp32 softmax/norms, bf16 matmuls with fp32
accumulation, fixed-shape prefill + incremental decoding for beam search.

Left-padded batching: generation-time prompts are LEFT-padded (HF
decoder-only convention) so every sequence's last real token sits at the
same position; RoPE positions are computed from the attention mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

NEG_INF = -1e10


@dataclasses.dataclass(frozen=True)
class CausalLMConfig:
    vocab_size: int = 32000
    d_model: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32  # < num_heads => grouped-query attention
    d_ff: int = 11008
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 0
    compute_dtype: Any = jnp.float32
    # Fused Pallas causal attention for the teacher-forced (fine-tuning)
    # path — removes the [B, H, T, T] score + causal-bias materializations
    # (`ops/flash_attention.scaled_causal_flash_attention`). Engine/decode
    # paths are per-token and unaffected.
    flash_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


def init_params(rng: jax.Array, cfg: CausalLMConfig) -> Params:
    def dense(key, i, o):
        return (i ** -0.5) * jax.random.normal(key, (i, o), jnp.float32)

    def layer(key):
        kq, kk, kv, ko, kg, ku, kd = jax.random.split(key, 7)
        return {
            "input_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "q": dense(kq, cfg.d_model, cfg.num_heads * cfg.head_dim),
            "k": dense(kk, cfg.d_model, cfg.kv_dim),
            "v": dense(kv, cfg.d_model, cfg.kv_dim),
            "o": dense(ko, cfg.num_heads * cfg.head_dim, cfg.d_model),
            "post_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "gate": dense(kg, cfg.d_model, cfg.d_ff),
            "up": dense(ku, cfg.d_model, cfg.d_ff),
            "down": dense(kd, cfg.d_ff, cfg.d_model),
        }

    k_emb, k_layers, k_head = jax.random.split(rng, 3)
    layers = [
        layer(jax.random.fold_in(k_layers, i)) for i in range(cfg.num_layers)
    ]
    params: Params = {
        "embedding": jax.random.normal(
            k_emb, (cfg.vocab_size, cfg.d_model), jnp.float32
        )
        * 0.02,
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(k_head, cfg.d_model, cfg.vocab_size)
    return params


# ------------------------------------------------------------------ #
# Building blocks
# ------------------------------------------------------------------ #


def _rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(dtype)


def _dense(x: jnp.ndarray, w: Any, dtype: jnp.dtype) -> jnp.ndarray:
    from reprover_tpu.models.quantize import QuantWeight, quantized_dense

    if isinstance(w, QuantWeight):  # weight-only int8 serving path
        return quantized_dense(x, w, dtype)
    return jnp.dot(
        x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def _lm_logits(params: Params, cfg: CausalLMConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Final vocab projection -> fp32 logits ([..., D] -> [..., V]);
    consumes either a raw weight or an int8 :class:`QuantWeight` lm_head
    (the 4096x32000 projection is the largest single weight stream in a
    7B-class decode step — the w8a16 kernel halves its HBM read)."""
    from reprover_tpu.models.quantize import QuantWeight, quantized_logits

    w = params["embedding"].T if cfg.tie_word_embeddings else params["lm_head"]
    if isinstance(w, QuantWeight):
        return quantized_logits(h, w, cfg.compute_dtype)
    return jnp.dot(
        h.astype(cfg.compute_dtype),
        w.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    )


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF Llama convention (rotate_half).

    x: [B, H, T, d]; positions: [B, T] (or [T]).
    """
    d = x.shape[-1]
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )  # [d/2]
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[:, :, None].astype(jnp.float32) * inv_freq  # [B, T, d/2]
    # HF layout: cos/sin tiled as [angles, angles] over the full head dim.
    cos = jnp.concatenate([jnp.cos(angles), jnp.cos(angles)], axis=-1)
    sin = jnp.concatenate([jnp.sin(angles), jnp.sin(angles)], axis=-1)
    cos = cos[:, None, :, :]  # [B, 1, T, d]
    sin = sin[:, None, :, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated * sin).astype(x.dtype)


def _repeat_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[B, Hkv, T, d] -> [B, Hkv*groups, T, d] (GQA broadcast)."""
    if groups == 1:
        return x
    return jnp.repeat(x, groups, axis=1)


def _rope_bthd(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """:func:`_rope` for the [B, T, H, d] layout (flash path: heads stay
    lane slices of the flat projection, so no [B, H, T, d] transpose)."""
    d = x.shape[-1]
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )  # [d/2]
    angles = positions[:, :, None].astype(jnp.float32) * inv_freq  # [B, T, d/2]
    cos = jnp.concatenate([jnp.cos(angles), jnp.cos(angles)], axis=-1)
    sin = jnp.concatenate([jnp.sin(angles), jnp.sin(angles)], axis=-1)
    cos = cos[:, :, None, :]  # [B, T, 1, d]
    sin = sin[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated * sin).astype(x.dtype)


def _attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: float,
    dtype: jnp.dtype,
) -> jnp.ndarray:
    scores = (
        jnp.einsum(
            "bhqd,bhkd->bhqk",
            q.astype(dtype),
            k.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def _split(x: jnp.ndarray, heads: int, d: int) -> jnp.ndarray:
    b, t, _ = x.shape
    return x.reshape(b, t, heads, d).transpose(0, 2, 1, 3)


def _merge(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


# ------------------------------------------------------------------ #
# Full-sequence forward (training / parity)
# ------------------------------------------------------------------ #


def forward_logits(
    params: Params,
    cfg: CausalLMConfig,
    input_ids: jnp.ndarray,  # [B, T]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, T]; None = all real
) -> jnp.ndarray:
    """Causal forward -> fp32 logits [B, T, vocab]. Left- or right-padding
    both work: positions come from the mask cumsum and padded keys are
    masked out."""
    dtype = cfg.compute_dtype
    b, t = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    positions = jnp.cumsum(attention_mask, axis=1) - 1  # [B, T], pads clamp
    positions = jnp.maximum(positions, 0)

    h = params["embedding"].astype(dtype)[input_ids]
    scale = cfg.head_dim ** -0.5
    groups = cfg.num_heads // cfg.num_kv_heads
    use_flash = cfg.flash_attention and t % 128 == 0
    if use_flash:
        from reprover_tpu.ops.flash_attention import (
            scaled_causal_flash_attention,
        )

        interpret = jax.default_backend() != "tpu"
        hh, dh = cfg.num_heads, cfg.head_dim

        def layer(h, lp):
            n = _rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
            # RoPE in [B, T, H, d] (reshape only — heads remain lane
            # slices of the flat projection the kernel consumes).
            q = _rope_bthd(
                _dense(n, lp["q"], dtype).reshape(b, t, hh, dh),
                positions, cfg.rope_theta,
            ).reshape(b, t, hh * dh)
            k = _rope_bthd(
                _dense(n, lp["k"], dtype).reshape(b, t, cfg.num_kv_heads, dh),
                positions, cfg.rope_theta,
            )
            v = _dense(n, lp["v"], dtype).reshape(b, t, cfg.num_kv_heads, dh)
            k = jnp.repeat(k, groups, axis=2).reshape(b, t, hh * dh)
            v = jnp.repeat(v, groups, axis=2).reshape(b, t, hh * dh)
            attn = scaled_causal_flash_attention(
                q, k, v, attention_mask, num_heads=hh, scale=scale,
                interpret=interpret,
            )
            h = h + _dense(attn, lp["o"], dtype)
            n = _rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
            gate = jax.nn.silu(
                _dense(n, lp["gate"], dtype).astype(jnp.float32)
            ).astype(dtype)
            h = h + _dense(gate * _dense(n, lp["up"], dtype), lp["down"], dtype)
            return h, None

        h, _ = jax.lax.scan(layer, h, params["layers"])
        h = _rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
        return _lm_logits(params, cfg, h)

    causal = (jnp.arange(t)[None, :] <= jnp.arange(t)[:, None])[None, None]
    key_ok = attention_mask[:, None, None, :].astype(bool)
    bias = jnp.where(causal & key_ok, 0.0, NEG_INF).astype(jnp.float32)

    def layer(h, lp):
        n = _rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q = _split(_dense(n, lp["q"], dtype), cfg.num_heads, cfg.head_dim)
        k = _split(_dense(n, lp["k"], dtype), cfg.num_kv_heads, cfg.head_dim)
        v = _split(_dense(n, lp["v"], dtype), cfg.num_kv_heads, cfg.head_dim)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        attn = _attention(q, _repeat_kv(k, groups), _repeat_kv(v, groups), bias, scale, dtype)
        h = h + _dense(_merge(attn), lp["o"], dtype)
        n = _rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(_dense(n, lp["gate"], dtype).astype(jnp.float32)).astype(dtype)
        h = h + _dense(gate * _dense(n, lp["up"], dtype), lp["down"], dtype)
        return h, None

    h, _ = jax.lax.scan(layer, h, params["layers"])
    h = _rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return _lm_logits(params, cfg, h)


# ------------------------------------------------------------------ #
# Incremental decoding (prefill + step) for beam search / serving
# ------------------------------------------------------------------ #


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CausalDecodeState:
    """KV cache [L, B, Hkv, max_len, d] + per-row write cursor & mask."""

    k: jnp.ndarray
    v: jnp.ndarray
    key_mask: jnp.ndarray  # [B, max_len] {0,1} — which cache slots are real
    step: jnp.ndarray  # scalar: next write position
    position: jnp.ndarray  # [B] rope position of the next token

    def tree_flatten(self) -> tuple[tuple[jnp.ndarray, ...], None]:
        return ((self.k, self.v, self.key_mask, self.step, self.position), None)

    @classmethod
    def tree_unflatten(cls, aux: None, children: tuple) -> "CausalDecodeState":
        return cls(*children)


def prefill(
    params: Params,
    cfg: CausalLMConfig,
    input_ids: jnp.ndarray,  # [B, P] LEFT-padded prompts
    attention_mask: jnp.ndarray,  # [B, P]
    max_decode_len: int,
) -> Tuple[jnp.ndarray, CausalDecodeState]:
    """Process the prompt; return (next-token fp32 logits [B, V], state).

    The returned state has the prompt's keys/values in cache slots [0, P) and
    writes continue at P.
    """
    dtype = cfg.compute_dtype
    b, p = input_ids.shape
    total = p + max_decode_len
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)

    h = params["embedding"].astype(dtype)[input_ids]
    causal = (jnp.arange(p)[None, :] <= jnp.arange(p)[:, None])[None, None]
    key_ok = attention_mask[:, None, None, :].astype(bool)
    bias = jnp.where(causal & key_ok, 0.0, NEG_INF).astype(jnp.float32)
    scale = cfg.head_dim ** -0.5
    groups = cfg.num_heads // cfg.num_kv_heads

    def layer(h, lp):
        n = _rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q = _split(_dense(n, lp["q"], dtype), cfg.num_heads, cfg.head_dim)
        k = _split(_dense(n, lp["k"], dtype), cfg.num_kv_heads, cfg.head_dim)
        v = _split(_dense(n, lp["v"], dtype), cfg.num_kv_heads, cfg.head_dim)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        attn = _attention(q, _repeat_kv(k, groups), _repeat_kv(v, groups), bias, scale, dtype)
        h = h + _dense(_merge(attn), lp["o"], dtype)
        n = _rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(_dense(n, lp["gate"], dtype).astype(jnp.float32)).astype(dtype)
        h = h + _dense(gate * _dense(n, lp["up"], dtype), lp["down"], dtype)
        # cache: pad the prompt K/V out to the full cache length
        k_pad = jnp.pad(k, ((0, 0), (0, 0), (0, max_decode_len), (0, 0)))
        v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, max_decode_len), (0, 0)))
        return h, (k_pad, v_pad)

    h, (ks, vs) = jax.lax.scan(layer, h, params["layers"])
    h = _rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    logits = _lm_logits(params, cfg, h[:, -1, :])

    key_mask = jnp.pad(attention_mask, ((0, 0), (0, max_decode_len)))
    state = CausalDecodeState(
        k=ks,
        v=vs,
        key_mask=key_mask.astype(jnp.int32),
        step=jnp.asarray(p, jnp.int32),
        position=positions[:, -1] + 1,
    )
    return logits, state


def decode_step(
    params: Params,
    cfg: CausalLMConfig,
    state: CausalDecodeState,
    token: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, CausalDecodeState]:
    """One incremental step -> (fp32 logits [B, V], new state)."""
    dtype = cfg.compute_dtype
    b = token.shape[0]
    pos = state.step
    scale = cfg.head_dim ** -0.5
    groups = cfg.num_heads // cfg.num_kv_heads

    h = params["embedding"].astype(dtype)[token][:, None, :]
    rope_pos = state.position[:, None]  # [B, 1]
    new_mask = state.key_mask.at[:, pos].set(1)
    bias = jnp.where(new_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    def layer(carry, inputs):
        h = carry
        lp, k_cache, v_cache = inputs
        n = _rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q = _split(_dense(n, lp["q"], dtype), cfg.num_heads, cfg.head_dim)
        k = _split(_dense(n, lp["k"], dtype), cfg.num_kv_heads, cfg.head_dim)
        v = _split(_dense(n, lp["v"], dtype), cfg.num_kv_heads, cfg.head_dim)
        q = _rope(q, rope_pos, cfg.rope_theta)
        k = _rope(k, rope_pos, cfg.rope_theta)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, pos, 0))
        attn = _attention(
            q,
            _repeat_kv(k_cache, groups),
            _repeat_kv(v_cache, groups),
            bias,
            scale,
            dtype,
        )
        h = h + _dense(_merge(attn), lp["o"], dtype)
        n = _rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(_dense(n, lp["gate"], dtype).astype(jnp.float32)).astype(dtype)
        h = h + _dense(gate * _dense(n, lp["up"], dtype), lp["down"], dtype)
        return h, (k_cache, v_cache)

    h, (ks, vs) = jax.lax.scan(layer, h, (params["layers"], state.k, state.v))
    h = _rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    logits = _lm_logits(params, cfg, h[:, 0, :])
    new_state = CausalDecodeState(
        k=ks,
        v=vs,
        key_mask=new_mask,
        step=state.step + 1,
        position=state.position + 1,
    )
    return logits, new_state


def causal_lm_loss(
    params: Params,
    cfg: CausalLMConfig,
    input_ids: jnp.ndarray,  # [B, T]
    attention_mask: jnp.ndarray,  # [B, T]
    labels: jnp.ndarray,  # [B, T] int, -100 = ignored (HF convention)
) -> jnp.ndarray:
    """Next-token CE with -100 masking — in-framework decoder-only
    fine-tuning on the [GOAL]/[PROOFSTEP] pairs the reference exports to
    LLaMA-Factory (`generation/preprocess.py:30-37`)."""
    logits = forward_logits(params, cfg, input_ids, attention_mask)
    # shift: logits at t predict labels at t+1
    logits = logits[:, :-1, :]
    targets = labels[:, 1:]
    valid = targets != -100
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
