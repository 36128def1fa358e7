"""Pallas TPU kernel: fused T5 encoder self-attention.

Replaces the naive path's HBM round-trips — materializing ``[B, H, L, L]``
scores, adding the precomputed ``[1, H, L, L]`` position-bias tensor, and a
separate softmax pass (measured at ~20% of encoder step time at L=1024) —
with one kernel per batch element that keeps everything in VMEM.

Layout choice (measured on v5e): the kernel consumes q/k/v in the **flat
``[B, L, H*d]`` projection layout** and emits the same layout. Per-head
views are lane slices inside VMEM, and the K "transpose" is folded into the
in-kernel ``dot_general`` contraction. This avoids the
``[B, L, H, d] -> [B, H, L, d]`` relayouts the naive path needs around its
batched matmuls — those relayouts (or an XLA-level ``swapaxes`` feeding the
kernel) measured 2-3x slower than this form.

Per head:
- scores tile ``[L, L]`` = q_h @ k_h^T on the MXU (T5: unscaled);
- the T5 relative-position bias is computed *inside* the kernel from the
  log-bucket formula (exact HF semantics) on broadcasted iotas — shared
  across heads — plus a 32-way select against the tiny per-head bias
  vector: zero HBM bias traffic;
- the padding mask folds in as ``-1e10``;
- exact fp32 softmax over the full row (K is VMEM-resident), probs @ v_h on
  the MXU.

Forward-only: training keeps the naive composable path (XLA autodiff);
inference (corpus re-indexing, query encoding, beam-search encoder) uses
this kernel. Numerics match the naive path to bf16 tolerance (tested).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _bucket_map(
    q_start: jnp.ndarray,  # scalar int32 — first query row of this block
    block_q: int,
    kv_len: int,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """[block_q, kv_len] int32 T5 bidirectional relative-position buckets."""
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, kv_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, kv_len), 1)
    rel = cols - rows  # memory_position - query_position

    half = num_buckets // 2
    ret = jnp.where(rel > 0, half, 0).astype(jnp.int32)
    rp = jnp.abs(rel)
    max_exact = half // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact + 1e-20)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, half - 1)
    return ret + jnp.where(is_small, rp, rp_large)


def _encoder_attn_kernel(
    q_ref,  # [1, BQ, H*d]
    k_ref,  # [1, L, H*d]
    v_ref,  # [1, L, H*d]
    mask_ref,  # [1, 1, L] int32
    rel_ref,  # [H, 1, num_buckets] fp32
    out_ref,  # [1, BQ, H*d]
    *,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
):
    block_q = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    d = k_ref.shape[2] // num_heads

    q_start = pl.program_id(1) * block_q
    bucket = _bucket_map(q_start, block_q, kv_len, num_buckets, max_distance)
    mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, L]

    for h in range(num_heads):
        qh = q_ref[0, :, h * d : (h + 1) * d]
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]

        # T5 attention is unscaled (no 1/sqrt(d)).
        scores = jax.lax.dot_general(
            qh,
            kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, L] fp32

        rel_vec = rel_ref[h, 0]  # [num_buckets]
        bias = jnp.zeros_like(scores)
        for b in range(num_buckets):
            bias = jnp.where(bucket == b, rel_vec[b], bias)
        scores += bias + mask_bias

        # Exact fp32 softmax (full row resident in VMEM).
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        probs = (p / l).astype(vh.dtype)

        out_ref[0, :, h * d : (h + 1) * d] = jnp.dot(
            probs, vh, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads",
        "num_buckets",
        "max_distance",
        "block_q",
        "interpret",
    ),
)
def encoder_flash_attention(
    q: jnp.ndarray,  # [B, L, H*d] — raw projection layout
    k: jnp.ndarray,  # [B, L, H*d]
    v: jnp.ndarray,  # [B, L, H*d]
    mask: jnp.ndarray,  # [B, L] int {0,1}
    rel_bias: jnp.ndarray,  # [num_buckets, H] fp32 (HF layout)
    num_heads: int,
    num_buckets: int = 32,
    max_distance: int = 128,
    block_q: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bidirectional T5 self-attention -> [B, L, H*d]."""
    b, l, inner = q.shape
    # Query blocking bounds VMEM. The kernel keeps ~4 fp32 [BQ, L] tiles
    # live (scores, bucket map, bias, exp); budget them to ~8 MB so the
    # whole cell (plus K/V and double-buffered blocks) stays under the
    # 16 MB VMEM limit.
    budget_rows = max(128, (8 * 1024 * 1024) // (16 * l))
    for cand in (block_q, 512, 256, 128):
        if cand <= budget_rows and l % cand == 0 and cand <= l:
            block_q = cand
            break
    else:
        block_q = l
    # Singleton middle dims keep the trailing block dims equal to the full
    # array dims (Mosaic's (8, 128)-or-full tiling rule).
    rel_hb = rel_bias.T.astype(jnp.float32)[:, None, :]  # [H, 1, nb]
    mask3 = mask.astype(jnp.int32)[:, None, :]  # [B, 1, L]

    kernel = functools.partial(
        _encoder_attn_kernel,
        num_heads=num_heads,
        num_buckets=num_buckets,
        max_distance=max_distance,
    )
    d = inner // num_heads
    flops = 2 * 2 * b * num_heads * l * l * d + 40 * b * num_heads * l * l
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, inner), q.dtype),
        grid=(b, l // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, inner),
                lambda bi, qi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, l, inner), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, l, inner), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, l), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_heads, 1, rel_hb.shape[2]),
                lambda bi, qi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, inner),
            lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=q.size * 8,
            transcendentals=b * num_heads * l * l,
        ),
        interpret=interpret,
    )(q, k, v, mask3, rel_hb)
