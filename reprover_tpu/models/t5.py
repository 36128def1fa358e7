"""Functional T5 (ByT5) encoder-decoder in pure JAX.

A ground-up TPU-first implementation of the T5 architecture used by the
reference via HF Transformers (`/root/reference/retrieval/model.py:45`,
`/root/reference/generation/model.py:87`): RMSNorm (pre-norm), relative
position bias shared from the first layer, unscaled dot-product attention,
gated-GELU feed-forward, untied LM head (ByT5 convention).

Design choices (idiomatic JAX/XLA rather than a torch translation):

- **Pure functions + pytree params.** No module framework; every entry point
  is `f(params, config, ...) -> arrays`, directly `jit`/`pjit`-able and
  trivially shardable with `PartitionSpec`s.
- **Stacked layer parameters + `lax.scan`.** Per-layer weights carry a
  leading `num_layers` axis; the layer stack is a single scanned XLA while
  loop: O(1) HLO size in depth, fast compiles, natural remat boundary.
- **fp32 islands.** Softmax, RMSNorm statistics and the final logits run in
  float32 regardless of `compute_dtype`; matmuls run in `compute_dtype`
  (bfloat16 on TPU) on the MXU with fp32 accumulation via
  ``preferred_element_type``.
- **Fixed-shape incremental decoding.** `init_decode_state`/`decode_step`
  maintain a pre-allocated KV cache for beam search under `lax.while_loop`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

NEG_INF = -1e10


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 384
    d_model: int = 1472
    d_kv: int = 64
    d_ff: int = 3584
    num_heads: int = 6
    num_encoder_layers: int = 12
    num_decoder_layers: int = 4
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    tie_word_embeddings: bool = False
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    compute_dtype: Any = jnp.float32
    remat: bool = False  # rematerialize each layer's activations in backward
    # Selective remat: "full" recomputes the whole layer in backward (lowest
    # memory); "lite" saves the tagged fat intermediates (MLP hidden, QKV
    # projections, attention outputs) so the backward recomputes only norms
    # and elementwise ops — trades ~5 GB of activations (byt5-small at the
    # reference generation config) for skipping ~95% of the recompute FLOPs;
    # "offload" streams those same intermediates to pinned host memory
    # instead (the reference's DeepSpeed cpu_checkpointing role) — "lite"
    # FLOP savings at zero HBM cost, paying host-DMA bandwidth.
    remat_policy: str = "full"
    # Fused Pallas encoder self-attention (forward-only: enable for
    # inference paths; training uses the naive composable path for autodiff).
    flash_encoder: bool = False
    # Fused Pallas decoder attention for the teacher-forced path: causal
    # self-attention (unidirectional rel-bias buckets) + encoder-decoder
    # cross-attention, both with custom-VJP backward kernels. Removes the
    # [B,H,T,T] and [B,H,T,S] score materializations from training.
    flash_decoder: bool = False
    # Unroll the encoder layer stack instead of lax.scan (inference only:
    # larger compile, measured ~6% faster steps — scan's per-layer slicing
    # has real cost; training keeps scan for O(1) HLO and remat).
    unroll_encoder: bool = False
    # Force the flash-encoder q-block size (0 = VMEM budget heuristic).
    # The heuristic under-blocks at L=2304 (picks 128 where 256/384/768
    # fit — validated by benchmarks/aot_compile_check.py probes); sweep on
    # hardware with benchmarks/flash_kernel_bisect.py --sweep-block-q.
    flash_block_q: int = 0
    # Route the flash encoder through the KV-blocked online-softmax kernel
    # with this KV block size (0 = full-row kernel below L=4096). With
    # block_kv=512 the q-block stays 512 at any L — the lever for lengths
    # (e.g. 2304) where the full-row VMEM heuristic drops block_q to 128.
    flash_block_kv: int = 0

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def byt5_small(**overrides: object) -> T5Config:
    """google/byt5-small geometry (300M params)."""
    return T5Config(**overrides)


# ------------------------------------------------------------------ #
# Parameter init
# ------------------------------------------------------------------ #


def _dense_init(rng: jax.Array, in_dim: int, out_dim: int, factor: float) -> jnp.ndarray:
    """T5-style init: normal(0, factor / sqrt(in_dim)). Stored as
    [in_dim, out_dim] (right-multiplication: y = x @ W)."""
    std = factor * (in_dim ** -0.5)
    return std * jax.random.normal(rng, (in_dim, out_dim), dtype=jnp.float32)


def _attn_init(rng: jax.Array, cfg: T5Config) -> Params:
    kq, kk, kv, ko = jax.random.split(rng, 4)
    # T5 init: q ~ N(0, (d_model*d_kv)^-0.5), k/v ~ N(0, d_model^-0.5),
    # o ~ N(0, inner^-0.5).
    return {
        "q": ((cfg.d_model * cfg.d_kv) ** -0.5)
        * jax.random.normal(kq, (cfg.d_model, cfg.inner_dim), jnp.float32),
        "k": _dense_init(kk, cfg.d_model, cfg.inner_dim, 1.0),
        "v": _dense_init(kv, cfg.d_model, cfg.inner_dim, 1.0),
        "o": _dense_init(ko, cfg.inner_dim, cfg.d_model, 1.0),
    }


def _mlp_init(rng: jax.Array, cfg: T5Config) -> Params:
    k0, k1, k2 = jax.random.split(rng, 3)
    return {
        "wi_0": _dense_init(k0, cfg.d_model, cfg.d_ff, 1.0),
        "wi_1": _dense_init(k1, cfg.d_model, cfg.d_ff, 1.0),
        "wo": _dense_init(k2, cfg.d_ff, cfg.d_model, 1.0),
    }


def _stack(trees: Sequence[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_params(rng: jax.Array, cfg: T5Config) -> Params:
    """Random-init parameters matching the T5 initialization scheme."""
    k_emb, k_enc, k_dec, k_head, k_eb, k_db = jax.random.split(rng, 6)

    enc_layers = []
    for i in range(cfg.num_encoder_layers):
        k_attn, k_mlp = jax.random.split(jax.random.fold_in(k_enc, i))
        enc_layers.append(
            {
                "attn": _attn_init(k_attn, cfg),
                "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "mlp": _mlp_init(k_mlp, cfg),
                "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
            }
        )

    dec_layers = []
    for i in range(cfg.num_decoder_layers):
        k_self, k_cross, k_mlp = jax.random.split(jax.random.fold_in(k_dec, i), 3)
        dec_layers.append(
            {
                "self_attn": _attn_init(k_self, cfg),
                "self_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "cross_attn": _attn_init(k_cross, cfg),
                "cross_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "mlp": _mlp_init(k_mlp, cfg),
                "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
            }
        )

    params: Params = {
        "shared_embedding": jax.random.normal(
            k_emb, (cfg.vocab_size, cfg.d_model), jnp.float32
        ),
        "encoder": {
            "rel_bias": jax.random.normal(
                k_eb, (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32
            )
            * (cfg.d_model ** -0.5),
            "layers": _stack(enc_layers),
            "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        },
        "decoder": {
            "rel_bias": jax.random.normal(
                k_db, (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32
            )
            * (cfg.d_model ** -0.5),
            "layers": _stack(dec_layers),
            "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _dense_init(k_head, cfg.d_model, cfg.vocab_size, 1.0)
    return params


# ------------------------------------------------------------------ #
# Building blocks
# ------------------------------------------------------------------ #


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5 LayerNorm: RMS-only, no mean subtraction, fp32 statistics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU (HF 'gelu_new'), matching T5 gated-GELU."""
    return (
        0.5
        * x
        * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * jnp.power(x, 3.0))))
    )


def _dense(x: jnp.ndarray, w: Any, dtype: jnp.dtype) -> jnp.ndarray:
    from reprover_tpu.models.quantize import QuantWeight, quantized_dense

    if isinstance(w, QuantWeight):  # weight-only int8 serving path
        return quantized_dense(x, w, dtype)
    return jnp.dot(
        x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """T5 log-binned relative position bucketing (exact HF semantics)."""
    ret = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        ret += (relative_position > 0).astype(jnp.int32) * num_buckets
        rp = jnp.abs(relative_position)
    else:
        rp = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, num_buckets - 1)
    return ret + jnp.where(is_small, rp, rp_large)


def compute_position_bias(
    rel_bias: jnp.ndarray,
    query_positions: jnp.ndarray,
    key_positions: jnp.ndarray,
    bidirectional: bool,
    cfg: T5Config,
) -> jnp.ndarray:
    """Relative position bias [1, heads, Q, K] from arbitrary position vectors."""
    rel = key_positions[None, :] - query_positions[:, None]  # [Q, K]
    buckets = relative_position_bucket(
        rel,
        bidirectional,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = rel_bias[buckets]  # [Q, K, H]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)


def _split_heads(x: jnp.ndarray, num_heads: int, d_kv: int) -> jnp.ndarray:
    b, l, _ = x.shape
    return x.reshape(b, l, num_heads, d_kv).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def attention(
    q: jnp.ndarray,  # [B, H, Q, d]
    k: jnp.ndarray,  # [B, H, K, d]
    v: jnp.ndarray,  # [B, H, K, d]
    bias: Optional[jnp.ndarray],  # additive fp32 [B or 1, H or 1, Q, K]
    dtype: jnp.dtype,
) -> jnp.ndarray:
    """Unscaled dot-product attention with fp32 softmax (T5 has no 1/sqrt(d))."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(dtype),
        k.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v.astype(dtype), preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


def _attn_block(
    x: jnp.ndarray,
    kv_src: jnp.ndarray,
    p: Params,
    bias: Optional[jnp.ndarray],
    cfg: T5Config,
) -> jnp.ndarray:
    from jax.ad_checkpoint import checkpoint_name

    dtype = cfg.compute_dtype
    q = _split_heads(
        checkpoint_name(_dense(x, p["q"], dtype), "qkv"), cfg.num_heads, cfg.d_kv
    )
    k = _split_heads(
        checkpoint_name(_dense(kv_src, p["k"], dtype), "qkv"),
        cfg.num_heads,
        cfg.d_kv,
    )
    v = _split_heads(
        checkpoint_name(_dense(kv_src, p["v"], dtype), "qkv"),
        cfg.num_heads,
        cfg.d_kv,
    )
    out = checkpoint_name(attention(q, k, v, bias, dtype), "attn_out")
    return _dense(_merge_heads(out), p["o"], dtype)


def _layer_remat(layer_fn: Any, cfg: T5Config) -> Any:
    """Per-layer rematerialization with the configured policy (see
    ``T5Config.remat_policy``)."""
    if cfg.remat_policy == "lite":
        policy = jax.checkpoint_policies.save_only_these_names(
            "mlp_hidden", "qkv", "attn_out"
        )
        return jax.checkpoint(layer_fn, policy=policy)
    if cfg.remat_policy == "offload":
        # The reference's DeepSpeed ``cpu_checkpointing``
        # (/root/reference/retrieval/model.py:96-99, common.py:446-455):
        # checkpointed activations live in host memory, not HBM. Here the
        # tagged fat intermediates stream to pinned host RAM at forward time
        # and back at backward time, so HBM holds neither the activations
        # (as "lite" does) nor the recompute working set spikes — the
        # backward skips the same ~95% of recompute FLOPs as "lite" at zero
        # HBM cost, paying PCIe/DMA bandwidth instead.
        policy = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=["mlp_hidden", "qkv", "attn_out"],
            offload_src="device",
            offload_dst="pinned_host",
        )
        return jax.checkpoint(layer_fn, policy=policy)
    return jax.checkpoint(layer_fn)


def _mlp_block(x: jnp.ndarray, p: Params, cfg: T5Config) -> jnp.ndarray:
    from jax.ad_checkpoint import checkpoint_name

    dtype = cfg.compute_dtype
    if "wi" in p:
        # Pre-fused gate|up projection (see fuse_mlp_params): one wide MXU
        # matmul instead of two — measured +8% encoder throughput on v5e.
        h = checkpoint_name(_dense(x, p["wi"], dtype), "mlp_hidden")
        gate, up = jnp.split(h, 2, axis=-1)
        return _dense(gelu_new(gate) * up, p["wo"], dtype)
    gate = checkpoint_name(_dense(x, p["wi_0"], dtype), "mlp_hidden")
    up = checkpoint_name(_dense(x, p["wi_1"], dtype), "mlp_hidden")
    return _dense(gelu_new(gate) * up, p["wo"], dtype)


def fuse_mlp_params(params: Params) -> Params:
    """Concatenate each MLP's gate/up projections into one [D, 2F] weight.

    Inference-time layout optimization (applied by the serving loaders):
    numerics are identical; training and HF export keep the split layout.
    """

    def fuse(tree: Params) -> Params:
        if isinstance(tree, dict) and "wi_0" in tree and "wi_1" in tree:
            out = {k: v for k, v in tree.items() if k not in ("wi_0", "wi_1")}
            out["wi"] = jnp.concatenate([tree["wi_0"], tree["wi_1"]], axis=-1)
            return out
        if isinstance(tree, dict):
            return {k: fuse(v) for k, v in tree.items()}
        return tree

    return fuse(params)


def _mask_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, K] {0,1} mask -> additive fp32 bias [B, 1, 1, K]."""
    return jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF).astype(
        jnp.float32
    )


# ------------------------------------------------------------------ #
# Encoder
# ------------------------------------------------------------------ #


def encode(
    params: Params,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # int [B, L]
    attention_mask: jnp.ndarray,  # int [B, L]
) -> jnp.ndarray:
    """Encoder forward -> last hidden states [B, L, d_model]."""
    dtype = cfg.compute_dtype
    enc = params["encoder"]
    h = params["shared_embedding"].astype(dtype)[input_ids]

    length = input_ids.shape[1]
    use_flash = cfg.flash_encoder and length % 128 == 0
    if use_flash:
        from reprover_tpu.ops.flash_attention import encoder_flash_attention

        interpret = jax.default_backend() != "tpu"

        def layer(h, lp):
            from jax.ad_checkpoint import checkpoint_name

            eps = cfg.layer_norm_epsilon
            n = rms_norm(h, lp["attn_norm"], eps)
            p = lp["attn"]
            # Raw [B, L, H*d] projection layout straight into the kernel —
            # no head split/merge relayouts on the flash path.
            attn = encoder_flash_attention(
                checkpoint_name(_dense(n, p["q"], dtype), "qkv"),
                checkpoint_name(_dense(n, p["k"], dtype), "qkv"),
                checkpoint_name(_dense(n, p["v"], dtype), "qkv"),
                attention_mask,
                enc["rel_bias"],
                num_heads=cfg.num_heads,
                num_buckets=cfg.relative_attention_num_buckets,
                max_distance=cfg.relative_attention_max_distance,
                interpret=interpret,
                **(
                    {"block_kv": cfg.flash_block_kv}
                    if cfg.flash_block_kv
                    else {"block_q": cfg.flash_block_q, "force_block_q": True}
                    if cfg.flash_block_q
                    else {}
                ),
            )
            attn = checkpoint_name(attn, "attn_out")
            h = h + _dense(attn, p["o"], dtype)
            h = h + _mlp_block(rms_norm(h, lp["mlp_norm"], eps), lp["mlp"], cfg)
            return h, None

    else:
        bias = compute_position_bias(
            enc["rel_bias"], jnp.arange(length), jnp.arange(length), True, cfg
        )
        bias = bias + _mask_bias(attention_mask)  # [B, H, L, L]

        def layer(h, lp):
            n = rms_norm(h, lp["attn_norm"], cfg.layer_norm_epsilon)
            h = h + _attn_block(n, n, lp["attn"], bias, cfg)
            h = h + _mlp_block(
                rms_norm(h, lp["mlp_norm"], cfg.layer_norm_epsilon), lp["mlp"], cfg
            )
            return h, None

    if cfg.unroll_encoder and not cfg.remat:
        for i in range(cfg.num_encoder_layers):
            h, _ = layer(h, jax.tree.map(lambda x: x[i], enc["layers"]))
    else:
        if cfg.remat:
            layer = _layer_remat(layer, cfg)
        h, _ = jax.lax.scan(layer, h, enc["layers"])
    return rms_norm(h, enc["final_norm"], cfg.layer_norm_epsilon)


def encode_sequence_parallel(
    params: Params,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # int [B, L] — L sharded over `axis`
    attention_mask: jnp.ndarray,  # int [B, L]
    mesh: jax.sharding.Mesh,
    axis: str = "seq",
) -> jnp.ndarray:
    """Encoder forward with the sequence dimension sharded across the mesh.

    Beyond-parity long-context capability (SURVEY.md §5): activations live
    sequence-sharded on every device; self-attention runs as a ring over the
    mesh axis (:func:`reprover_tpu.ops.ring_attention.ring_encoder_attention`)
    while the position-independent blocks (norms, projections, MLP) compute
    locally under GSPMD. Numerics match :func:`encode` exactly (tested on the
    8-device CPU mesh).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from reprover_tpu.ops.ring_attention import ring_encoder_attention

    dtype = cfg.compute_dtype
    enc = params["encoder"]
    seq_sh = NamedSharding(mesh, P(None, axis))
    input_ids = jax.device_put(input_ids, seq_sh)
    attention_mask = jax.device_put(attention_mask, seq_sh)
    h = params["shared_embedding"].astype(dtype)[input_ids]

    def layer(h, lp):
        eps = cfg.layer_norm_epsilon
        n = rms_norm(h, lp["attn_norm"], eps)
        p = lp["attn"]
        q = _split_heads(_dense(n, p["q"], dtype), cfg.num_heads, cfg.d_kv)
        k = _split_heads(_dense(n, p["k"], dtype), cfg.num_heads, cfg.d_kv)
        v = _split_heads(_dense(n, p["v"], dtype), cfg.num_heads, cfg.d_kv)
        attn = ring_encoder_attention(
            q,
            k,
            v,
            attention_mask,
            enc["rel_bias"],
            mesh,
            axis=axis,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        h = h + _dense(_merge_heads(attn), p["o"], dtype)
        h = h + _mlp_block(rms_norm(h, lp["mlp_norm"], eps), lp["mlp"], cfg)
        return h, None

    h, _ = jax.lax.scan(layer, h, enc["layers"])
    return rms_norm(h, enc["final_norm"], cfg.layer_norm_epsilon)


# ------------------------------------------------------------------ #
# Decoder (teacher-forced full-sequence)
# ------------------------------------------------------------------ #


def shift_right(ids: jnp.ndarray, cfg: T5Config) -> jnp.ndarray:
    """Prepend ``decoder_start_token_id``; also maps -100 label fill to pad
    (HF `T5ForConditionalGeneration._shift_right` semantics)."""
    shifted = jnp.roll(ids, 1, axis=-1).at[:, 0].set(cfg.decoder_start_token_id)
    return jnp.where(shifted == -100, cfg.pad_token_id, shifted)


def decode(
    params: Params,
    cfg: T5Config,
    encoder_hidden: jnp.ndarray,  # [B, S, d_model]
    encoder_mask: jnp.ndarray,  # [B, S]
    decoder_input_ids: jnp.ndarray,  # [B, T]
    decoder_mask: Optional[jnp.ndarray] = None,  # [B, T] or None (causal only)
) -> jnp.ndarray:
    """Decoder forward -> logits [B, T, vocab] (fp32)."""
    dtype = cfg.compute_dtype
    dec = params["decoder"]
    h = params["shared_embedding"].astype(dtype)[decoder_input_ids]

    t = decoder_input_ids.shape[1]
    s = encoder_hidden.shape[1]
    use_flash = (
        cfg.flash_decoder
        and decoder_mask is None  # flash path is causal-only (HF semantics)
        and t % 128 == 0
        and s % 128 == 0
    )
    if use_flash:
        from reprover_tpu.ops.flash_attention import (
            causal_flash_attention,
            cross_flash_attention,
        )

        interpret = jax.default_backend() != "tpu"
        enc_h = encoder_hidden.astype(dtype)

        def layer(h, lp):
            from jax.ad_checkpoint import checkpoint_name

            eps = cfg.layer_norm_epsilon
            n = rms_norm(h, lp["self_norm"], eps)
            p = lp["self_attn"]
            # Flat [B, T, H*d] projection layout straight into the kernels
            # (see ops/flash_attention.py — avoids head split/merge relayouts).
            attn = causal_flash_attention(
                checkpoint_name(_dense(n, p["q"], dtype), "qkv"),
                checkpoint_name(_dense(n, p["k"], dtype), "qkv"),
                checkpoint_name(_dense(n, p["v"], dtype), "qkv"),
                dec["rel_bias"],
                num_heads=cfg.num_heads,
                num_buckets=cfg.relative_attention_num_buckets,
                max_distance=cfg.relative_attention_max_distance,
                interpret=interpret,
            )
            h = h + _dense(checkpoint_name(attn, "attn_out"), p["o"], dtype)
            pc = lp["cross_attn"]
            n = rms_norm(h, lp["cross_norm"], eps)
            attn = cross_flash_attention(
                checkpoint_name(_dense(n, pc["q"], dtype), "qkv"),
                checkpoint_name(_dense(enc_h, pc["k"], dtype), "qkv"),
                checkpoint_name(_dense(enc_h, pc["v"], dtype), "qkv"),
                encoder_mask,
                num_heads=cfg.num_heads,
                interpret=interpret,
            )
            h = h + _dense(checkpoint_name(attn, "attn_out"), pc["o"], dtype)
            h = h + _mlp_block(rms_norm(h, lp["mlp_norm"], eps), lp["mlp"], cfg)
            return h, None

    else:
        positions = jnp.arange(t)
        self_bias = compute_position_bias(
            dec["rel_bias"], positions, positions, False, cfg
        )
        causal = (positions[None, :] <= positions[:, None])[None, None]
        self_bias = jnp.where(causal, self_bias, NEG_INF)
        if decoder_mask is not None:
            self_bias = self_bias + _mask_bias(decoder_mask)
        cross_bias = _mask_bias(encoder_mask)

        def layer(h, lp):
            eps = cfg.layer_norm_epsilon
            n = rms_norm(h, lp["self_norm"], eps)
            h = h + _attn_block(n, n, lp["self_attn"], self_bias, cfg)
            h = h + _attn_block(
                rms_norm(h, lp["cross_norm"], eps),
                encoder_hidden.astype(dtype),
                lp["cross_attn"],
                cross_bias,
                cfg,
            )
            h = h + _mlp_block(rms_norm(h, lp["mlp_norm"], eps), lp["mlp"], cfg)
            return h, None

    # Cross-attention reads encoder_hidden from closure; keys/values are
    # recomputed per layer (cheap relative to the FF) — the incremental path
    # below caches them properly.
    if cfg.remat:
        layer = _layer_remat(layer, cfg)
    h, _ = jax.lax.scan(layer, h, dec["layers"])
    h = rms_norm(h, dec["final_norm"], cfg.layer_norm_epsilon)
    return _lm_logits(params, cfg, h)


def _lm_logits(params: Params, cfg: T5Config, h: jnp.ndarray) -> jnp.ndarray:
    from reprover_tpu.models.quantize import QuantWeight, quantized_logits

    if cfg.tie_word_embeddings:
        h = h * (cfg.d_model ** -0.5)
        w = params["shared_embedding"].T
    else:
        w = params["lm_head"]
    if isinstance(w, QuantWeight):
        return quantized_logits(h, w, cfg.compute_dtype)
    return jnp.dot(
        h.astype(cfg.compute_dtype),
        w.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    )


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, T, V] fp32
    labels: jnp.ndarray,  # [B, T] int, -100 = ignored
) -> jnp.ndarray:
    """Token-mean cross entropy with -100 masking (HF `labels` semantics,
    `/root/reference/generation/model.py:101-111`)."""
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


# ------------------------------------------------------------------ #
# Incremental decoding (KV cache) for beam search / serving
# ------------------------------------------------------------------ #


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DecodeState:
    """Pre-allocated decoder state for fixed-shape incremental decoding.

    ``self_k``/``self_v``: [L, B, H, max_len, d_kv] growing KV cache.
    ``cross_k``/``cross_v``: [L, B, H, S, d_kv] precomputed once per source.
    ``step``: number of tokens already written.
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    encoder_hidden: jnp.ndarray
    cross_bias: jnp.ndarray
    step: jnp.ndarray

    def tree_flatten(self) -> tuple[tuple[jnp.ndarray, ...], None]:
        return (
            (
                self.self_k,
                self.self_v,
                self.cross_k,
                self.cross_v,
                self.encoder_hidden,
                self.cross_bias,
                self.step,
            ),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux: None, children: tuple) -> "DecodeState":
        return cls(*children)


def init_decode_state(
    params: Params,
    cfg: T5Config,
    encoder_hidden: jnp.ndarray,  # [B, S, d_model]
    encoder_mask: jnp.ndarray,  # [B, S]
    max_decode_len: int,
) -> DecodeState:
    """Allocate the KV cache and precompute cross-attention keys/values."""
    dtype = cfg.compute_dtype
    b, s, _ = encoder_hidden.shape
    ld = cfg.num_decoder_layers

    def per_layer_cross(lp):
        k = _split_heads(_dense(encoder_hidden.astype(dtype), lp["cross_attn"]["k"], dtype), cfg.num_heads, cfg.d_kv)
        v = _split_heads(_dense(encoder_hidden.astype(dtype), lp["cross_attn"]["v"], dtype), cfg.num_heads, cfg.d_kv)
        return k, v

    cross_k, cross_v = jax.vmap(per_layer_cross)(params["decoder"]["layers"])

    shape = (ld, b, cfg.num_heads, max_decode_len, cfg.d_kv)
    return DecodeState(
        self_k=jnp.zeros(shape, dtype),
        self_v=jnp.zeros(shape, dtype),
        cross_k=cross_k,
        cross_v=cross_v,
        encoder_hidden=encoder_hidden.astype(dtype),
        cross_bias=_mask_bias(encoder_mask),
        step=jnp.zeros((), jnp.int32),
    )


def decode_step(
    params: Params,
    cfg: T5Config,
    state: DecodeState,
    token: jnp.ndarray,  # int [B] — token at position ``state.step``
) -> Tuple[jnp.ndarray, DecodeState]:
    """One incremental decoder step -> (logits [B, vocab] fp32, new state)."""
    dtype = cfg.compute_dtype
    dec = params["decoder"]
    b = token.shape[0]
    max_len = state.self_k.shape[3]
    pos = state.step

    h = params["shared_embedding"].astype(dtype)[token][:, None, :]  # [B, 1, D]

    key_positions = jnp.arange(max_len)
    self_bias = compute_position_bias(
        dec["rel_bias"], pos[None], key_positions, False, cfg
    )  # [1, H, 1, max_len]
    valid = (key_positions <= pos)[None, None, None, :]
    self_bias = jnp.where(valid, self_bias, NEG_INF)

    def layer(carry, inputs):
        h = carry
        lp, k_cache, v_cache, ck, cv = inputs
        eps = cfg.layer_norm_epsilon

        n = rms_norm(h, lp["self_norm"], eps)
        q = _split_heads(_dense(n, lp["self_attn"]["q"], dtype), cfg.num_heads, cfg.d_kv)
        k_new = _split_heads(_dense(n, lp["self_attn"]["k"], dtype), cfg.num_heads, cfg.d_kv)
        v_new = _split_heads(_dense(n, lp["self_attn"]["v"], dtype), cfg.num_heads, cfg.d_kv)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new, (0, 0, pos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new, (0, 0, pos, 0)
        )
        attn = attention(q, k_cache, v_cache, self_bias, dtype)
        h = h + _dense(_merge_heads(attn), lp["self_attn"]["o"], dtype)

        n = rms_norm(h, lp["cross_norm"], eps)
        q = _split_heads(_dense(n, lp["cross_attn"]["q"], dtype), cfg.num_heads, cfg.d_kv)
        attn = attention(q, ck, cv, state.cross_bias, dtype)
        h = h + _dense(_merge_heads(attn), lp["cross_attn"]["o"], dtype)

        h = h + _mlp_block(rms_norm(h, lp["mlp_norm"], eps), lp["mlp"], cfg)
        return h, (k_cache, v_cache)

    h, (new_k, new_v) = jax.lax.scan(
        layer,
        h,
        (dec["layers"], state.self_k, state.self_v, state.cross_k, state.cross_v),
    )
    h = rms_norm(h, dec["final_norm"], cfg.layer_norm_epsilon)
    logits = _lm_logits(params, cfg, h)[:, 0, :]

    new_state = DecodeState(
        self_k=new_k,
        self_v=new_v,
        cross_k=state.cross_k,
        cross_v=state.cross_v,
        encoder_hidden=state.encoder_hidden,
        cross_bias=state.cross_bias,
        step=state.step + 1,
    )
    return logits, new_state


def forward_loss(
    params: Params,
    cfg: T5Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    labels: jnp.ndarray,
) -> jnp.ndarray:
    """Seq2seq CE loss with HF ``labels`` semantics (shift-right inside)."""
    enc = encode(params, cfg, input_ids, attention_mask)
    dec_in = shift_right(labels, cfg)
    logits = decode(params, cfg, enc, attention_mask, dec_in)
    return cross_entropy_loss(logits, labels)
