"""Pallas TPU kernels: fused T5 encoder self-attention, forward and backward.

Replaces the naive path's HBM round-trips — materializing ``[B, H, L, L]``
scores, adding the precomputed ``[1, H, L, L]`` position-bias tensor, and a
separate softmax pass (measured at ~20% of encoder step time at L=1024) —
with kernels that keep everything in VMEM.

Layout choice (measured on v5e): the kernels consume q/k/v in the **flat
``[B, L, H*d]`` projection layout** and emit the same layout. Per-head
views are lane slices inside VMEM, and the K "transpose" is folded into the
in-kernel ``dot_general`` contraction. This avoids the
``[B, L, H, d] -> [B, H, L, d]`` relayouts the naive path needs around its
batched matmuls — those relayouts (or an XLA-level ``swapaxes`` feeding the
kernel) measured 2-3x slower than this form.

Per head (forward):
- scores tile ``[BQ, L]`` = q_h @ k_h^T on the MXU (T5: unscaled);
- the T5 relative-position bias is computed *inside* the kernel from the
  log-bucket formula (exact HF semantics) on broadcasted iotas, plus a
  32-way select against the tiny per-head bias vector: zero HBM bias
  traffic. The bias depends only on the (head, q-block) — every grid runs
  batch FASTEST and builds the bias tiles into a persistent VMEM scratch
  at ``bi == 0``, reusing them across the whole batch (rebuilding the
  select chain per cell was the VPU bottleneck: measured ~6% MFU at
  B=64, L=1024 — the chain cost B× the score matmuls);
- the padding mask folds in as ``-1e10``;
- exact fp32 softmax over the full row (K is VMEM-resident), probs @ v_h on
  the MXU.

Backward (``jax.custom_vjp``, enabling the kernel in *training* — the
reference trains attention through torch autograd,
`/root/reference/retrieval/model.py:116-140`): flash-style recomputation,
no ``[L, L]`` residuals ever touch HBM. ``delta = rowsum(dO * O)`` (exactly
``rowsum(P * dP)``) is computed in XLA from the saved forward output, then
two kernels run:

1. grid (batch, q-block): recompute scores/softmax (full KV row in VMEM),
   emit dQ = dS @ K and the per-row LSE, and accumulate the
   relative-position-bias gradient via per-bucket masked sums (SMEM scalar
   accumulation, revisited across the whole grid);
2. grid (batch, kv-block): rebuild P^T tiles from Q and the saved LSE,
   dS^T from delta, emit dK = dS^T @ Q and dV = P^T @ dO — each output
   block written exactly once (no accumulators).

VMEM-stack discipline (Mosaic allocates kernel temporaries statically, ~2
live tiles per unrolled select chain per head): the backward kernels run
their select chains over <=~1024-wide static column chunks, which bounds
the stack at L=2304 under the 16 MB limit. ``fori_loop`` versions measured
2.5x slower (32 serialized VPU passes don't pipeline) — keep chains
unrolled.

Numerics match the naive path to bf16 tolerance in both directions
(tested: forward and gradient parity vs XLA autodiff of the naive path).
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _bucket_map(
    row_start: jnp.ndarray,  # scalar int32 — first row of this block
    block_rows: int,
    num_cols: int,
    num_buckets: int,
    max_distance: int,
    transposed: bool = False,
    bidirectional: bool = True,
    col_start: jnp.ndarray | int = 0,  # first column (blockwise KV kernels)
) -> jnp.ndarray:
    """[block_rows, num_cols] int32 T5 relative-position buckets.

    Forward orientation (rows = query, cols = memory): rel = col - row.
    ``transposed`` (rows = memory, cols = query): rel = row - col — used by
    the dK/dV kernel whose tiles are the transpose of the score matrix.
    ``bidirectional=False`` is the decoder form: future keys (rel > 0)
    collapse to bucket 0 (they are causally masked anyway) and all
    ``num_buckets`` buckets cover the past.
    """
    rows = row_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, num_cols), 0
    )
    cols = col_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, num_cols), 1
    )
    rel = (rows - cols) if transposed else (cols - rows)

    if bidirectional:
        half = num_buckets // 2
        ret = jnp.where(rel > 0, half, 0).astype(jnp.int32)
        rp = jnp.abs(rel)
    else:
        half = num_buckets
        ret = jnp.zeros(rel.shape, jnp.int32)
        rp = jnp.maximum(-rel, 0)
    max_exact = half // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact + 1e-20)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, half - 1)
    return ret + jnp.where(is_small, rp, rp_large)


def _causal_invalid(
    row_start: jnp.ndarray,
    block_rows: int,
    num_cols: int,
    transposed: bool = False,
    col_start: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Bool tile marking causally-invalid cells (key position > query).

    Forward orientation: rows = query, cols = key. Transposed: rows = key,
    cols = query. Either way the invalid condition is key > query.
    """
    rows = row_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, num_cols), 0
    )
    cols = col_start + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, num_cols), 1
    )
    return (rows > cols) if transposed else (cols > rows)


def _chunk_cols(cols: int, target: int = 1024) -> int:
    """Largest 128-aligned column-chunk width <= ~target that divides cols."""
    blocks = max(cols // 128, 1)
    n = (cols + target - 1) // target
    while blocks % n:
        n += 1
    return cols // n


def _bias_tile(
    bucket: jax.Array,
    get_rel: Callable[[int], jax.Array],
    num_buckets: int,
    chunked: bool = False,
) -> jax.Array:
    """[rows, cols] fp32 bias tile from the bucket map + per-bucket scalars.

    Standalone select chain on zeros (independent of the score matmul, so
    the VPU work overlaps the MXU). ``chunked`` splits columns into static
    slices to bound the chain's live temporaries.
    """
    cols = bucket.shape[1]
    chunk = _chunk_cols(cols) if chunked else cols
    parts = []
    for c0 in range(0, cols, chunk):
        bk = bucket[:, c0 : c0 + chunk]
        t = jnp.zeros(bk.shape, jnp.float32)
        for b in range(num_buckets):
            t = jnp.where(bk == b, get_rel(b), t)
        parts.append(t)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


# ------------------------------------------------------------------ #
# Forward kernel
# ------------------------------------------------------------------ #


def _encoder_attn_kernel(
    q_ref: jax.Array,  # [1, BQ, H*d]
    k_ref: jax.Array,  # [1, L, H*d]
    v_ref: jax.Array,  # [1, L, H*d]
    mask_ref: jax.Array,  # [1, 1, L] int32
    rel_ref: jax.Array,  # [H, 1, num_buckets] fp32
    out_ref: jax.Array,  # [1, BQ, H*d]
    bias_ref: jax.Array,  # [H, BQ, L] fp32 VMEM scratch — persists over bi
    *,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    causal: bool = False,
) -> None:
    block_q = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    d = k_ref.shape[2] // num_heads

    qi, bi = pl.program_id(0), pl.program_id(1)
    q_start = qi * block_q

    # The relative-position bias (and the causal term) depend on the
    # q-block, NOT the batch cell. The grid runs bi fastest, so build the
    # per-head bias tiles once per q-block into a persistent VMEM scratch
    # and reuse them across the whole batch — the 32-way select chain was
    # the kernel's VPU bottleneck when rebuilt per (cell, head) (measured
    # ~6% MFU at B=64, L=1024).
    @pl.when(bi == 0)
    def _build_bias() -> None:
        bucket = _bucket_map(
            q_start, block_q, kv_len, num_buckets, max_distance,
            bidirectional=not causal,
        )
        causal_term = (
            jnp.where(
                _causal_invalid(q_start, block_q, kv_len), NEG_INF, 0.0
            )
            if causal
            else None
        )
        for h in range(num_heads):
            rel_vec = rel_ref[h, 0]  # [num_buckets]
            t = _bias_tile(bucket, lambda b: rel_vec[b], num_buckets)
            bias_ref[h] = t if causal_term is None else t + causal_term

    # Mask handling rides the MXU, not the VPU (round-5 VPU diet; the
    # softmax VPU share was 24% of the headline embed step):
    # - no [BQ, L] mask-bias add before the max — p keeps (worthless but
    #   harmless) mass at masked columns; the max over them only raises m,
    #   which cancels in the normalization;
    # - masked columns are excluded from the NUMERATOR by zeroing v's rows
    #   (one [L, d] pass per head, L/BQ-fold cheaper than a [BQ, L] add)
    #   and from the DENOMINATOR by l = p @ mask01 (an MXU matvec instead
    #   of a VPU row-sum).
    # Per (cell, head) this drops the [BQ, L] VPU passes from ~6 to ~4.
    mask01 = jnp.where(mask_ref[0] != 0, 1.0, 0.0)  # [1, L] fp32

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

        scores += bias_ref[h]

        # Exact fp32 softmax (full row resident in VMEM). The 1/l
        # normalization rides the [BQ, d] output instead of the [BQ, L]
        # probs tile (L-fold fewer divisions, same math).
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jax.lax.dot_general(
            p,
            mask01,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, 1] — masked columns excluded on the MXU
        # Fully-masked (padding) rows: l == 0; the old NEG_INF path gave
        # them finite garbage, this one must not emit inf/nan (the
        # masked-mean pooling downstream multiplies by 0 but nan*0=nan).
        l = jnp.maximum(l, 1e-20)

        out_ref[0, :, h * d : (h + 1) * d] = (
            jnp.dot(
                p.astype(vh.dtype),
                vh * mask01.reshape(kv_len, 1).astype(vh.dtype),
                preferred_element_type=jnp.float32,
            )
            / l
        ).astype(out_ref.dtype)


def _encoder_attn_kernel_blockwise(
    q_ref: jax.Array,  # [1, BQ, H*d]
    k_ref: jax.Array,  # [1, BK, H*d]
    v_ref: jax.Array,  # [1, BK, H*d]
    mask_ref: jax.Array,  # [1, 1, BK] int32
    rel_ref: jax.Array,  # [H, 1, num_buckets] fp32
    out_ref: jax.Array,  # [1, BQ, H*d] — revisited across ki, written at last
    bias_scr: jax.Array,  # [BQ, BK] fp32 scratch (reused per head)
    m_scr: jax.Array,  # [H, BQ] fp32 — running row max
    l_scr: jax.Array,  # [H, BQ] fp32 — running row sum
    acc_scr: jax.Array,  # [BQ, H*d] fp32 — running PV accumulator
    *,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    causal: bool,
) -> None:
    """KV-blocked T5 attention with online softmax (bidirectional, causal,
    or — rectangular with a zero bias table — cross).

    The survey's blockwise design (SURVEY.md §5 long-context): O(N) VMEM —
    neither K/V nor any [BQ, L] tile is ever resident, so sequence length
    is bounded by HBM, not by the 128 MB VMEM (the full-row kernel above
    needs ~L·inner·2 KV bytes + [BQ, L] score tiles per cell and tops out
    around L≈8-16k).

    T5-specific trick that makes the position bias O(N) instead of O(N²):
    buckets saturate at ``max_distance`` (`_bucket_map`), so any KV block
    whose whole relative-position range lies beyond it has a *constant*
    per-head bias — ``rel_vec[nb-1]`` right of the diagonal, or
    ``rel_vec[nb//2-1]`` left of it. Only the ~⌈(max_distance+BQ)/BK⌉+1
    near-diagonal blocks per q-block run the 32-way select chain (the
    kernel's historical VPU bottleneck); far blocks broadcast a scalar.

    Padding: masked scores are -1e10; a *fully masked* KV block leaves the
    running max at -1e10 until a valid block raises it, at which point the
    ``exp(m_prev - m_new)`` rescale zeroes the garbage l/acc exactly —
    same guarantee as the full-row kernel (each row needs >= 1 valid key,
    which the tokenizer invariant provides).

    ``causal=True``: all-future KV blocks are skipped outright (no matmul,
    no softmax — ~half the compute cells at long T), diagonal blocks fold
    the NEG_INF causal term into the bias tile, buckets go unidirectional.
    """
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]
    d = k_ref.shape[2] // num_heads
    qi, ki = pl.program_id(0), pl.program_id(2)
    nk = pl.num_programs(2)
    q_start = qi * block_q
    k_start = ki * block_kv

    @pl.when(ki == 0)
    def _init() -> None:
        m_scr[...] = jnp.full(m_scr.shape, -1e30, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    live = (
        k_start < q_start + block_q
        if causal
        else jnp.full((), True, jnp.bool_)
    )

    @pl.when(live)
    def _compute() -> None:
        mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, BK]

        for h in range(num_heads):
            rel_vec = rel_ref[h, 0]  # [num_buckets]
            _block_far_bias(
                bias_scr, lambda b: rel_vec[b], q_start, k_start,
                num_buckets, max_distance, False, causal,
            )

            qh = q_ref[0, :, h * d : (h + 1) * d]
            kh = k_ref[0, :, h * d : (h + 1) * d]
            vh = v_ref[0, :, h * d : (h + 1) * d]

            scores = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK] fp32 (T5: unscaled)
            scores += bias_scr[...] + mask_bias

            m_prev = m_scr[h]  # [BQ]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
            p = jnp.exp(scores - m_new[:, None])  # [BQ, BK]
            alpha = jnp.exp(m_prev - m_new)  # [BQ]
            l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1)
            m_scr[h] = m_new
            pv = jnp.dot(
                p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
            )  # [BQ, d]
            acc_scr[:, h * d : (h + 1) * d] = (
                acc_scr[:, h * d : (h + 1) * d] * alpha[:, None] + pv
            )

    @pl.when(ki == nk - 1)
    def _emit() -> None:
        for h in range(num_heads):
            out_ref[0, :, h * d : (h + 1) * d] = (
                acc_scr[:, h * d : (h + 1) * d] / l_scr[h][:, None]
            ).astype(out_ref.dtype)


def _blockwise_forward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    rel_bias: jax.Array,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    block_q: int,
    block_kv: int,
    interpret: bool,
    causal: bool = False,
) -> jax.Array:
    b, t, inner = q.shape
    s = k.shape[1]  # rectangular: cross-attention has kv len != q len
    # Working set is O(BQ·BK), independent of L — a fixed 512/512 block
    # pair keeps every tile comfortably inside VMEM at any sequence length.
    block_q = _largest_divisor_block(t, block_q)
    block_kv = _largest_divisor_block(s, block_kv)
    rel_hb = rel_bias.T.astype(jnp.float32)[:, None, :]  # [H, 1, nb]
    mask3 = mask.astype(jnp.int32)[:, None, :]  # [B, 1, S]
    d = inner // num_heads
    flops = 2 * 2 * b * num_heads * t * s * d + 40 * b * num_heads * t * s
    if causal:
        flops //= 2

    kernel = functools.partial(
        _encoder_attn_kernel_blockwise,
        num_heads=num_heads,
        num_buckets=num_buckets,
        max_distance=max_distance,
        causal=causal,
    )
    # ki fastest (the online-softmax scratches carry across it), batch
    # middle, q-block major: the q block stays resident across the whole
    # KV sweep; K/V blocks stream through double-buffered.
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, inner), q.dtype),
        grid=(t // block_q, b, s // block_kv),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, inner),
                lambda qi, bi, ki: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, inner),
                lambda qi, bi, ki: (bi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, inner),
                lambda qi, bi, ki: (bi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_kv),
                lambda qi, bi, ki: (bi, 0, ki),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_heads, 1, rel_hb.shape[2]),
                lambda qi, bi, ki: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, inner),
            lambda qi, bi, ki: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, block_kv), jnp.float32),
            pltpu.VMEM((num_heads, block_q), jnp.float32),
            pltpu.VMEM((num_heads, block_q), jnp.float32),
            pltpu.VMEM((block_q, inner), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=q.size * 8,
            transcendentals=b * num_heads * t * s,
        ),
        interpret=interpret,
    )(q, k, v, mask3, rel_hb)


def _largest_divisor_block(l: int, target: int) -> int:
    """Largest 128-multiple <= target that divides l (l itself if none)."""
    cand = (min(target, l) // 128) * 128
    while cand >= 128:
        if l % cand == 0:
            return cand
        cand -= 128
    return l


def _pick_block(
    block_q: int,
    l: int,
    tile_bytes: int,
    budget_bytes: int,
    tile_cols: int | None = None,
    force: bool = False,
) -> int:
    """Largest 128-multiple block of ``l`` whose score tiles fit the budget.

    ``tile_cols`` is the tiles' second dimension (defaults to ``l`` — the
    square self-attention case; cross-attention tiles are rectangular).
    ``force`` trusts the caller's ``block_q`` (must divide ``l``) instead of
    the VMEM budget heuristic — a tuning knob for shapes where the
    conservative budget under-blocks (e.g. BQ 128 at L=2304) but Mosaic
    still fits; validate candidates with ``benchmarks/aot_compile_check.py``
    before shipping a default."""
    if force and l % block_q == 0 and block_q <= l:
        return block_q
    cols = l if tile_cols is None else tile_cols
    budget_rows = max(128, budget_bytes // (tile_bytes * cols))
    for cand in (block_q, 512, 256, 128):
        if cand <= budget_rows and l % cand == 0 and cand <= l:
            return cand
    return l


def _forward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    rel_bias: jax.Array,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    block_q: int,
    interpret: bool,
    causal: bool = False,
    force_block_q: bool = False,
    block_kv: int = 0,
) -> jax.Array:
    b, l, inner = q.shape
    # KV-blocked path: explicit ``block_kv``, or automatically once the
    # full-row design's VMEM working set (full K/V per cell + [BQ, L]
    # score tiles + the [H, BQ, L] bias scratch) stops fitting — ~L > 4k.
    if block_kv or l > 4096:
        return _blockwise_forward_impl(
            q, k, v, mask, rel_bias, num_heads, num_buckets, max_distance,
            512 if block_q > 512 else block_q, block_kv or 512, interpret,
            causal,
        )
    # Query blocking bounds VMEM. The kernel keeps ~4 fp32 [BQ, L] tiles
    # live (scores, bucket map, bias, exp); budget them to ~8 MB so the
    # whole cell (plus K/V and double-buffered blocks) stays under the
    # 16 MB VMEM limit.
    block_q = _pick_block(block_q, l, 16, 8 * 1024 * 1024, force=force_block_q)
    # Singleton middle dims keep the trailing block dims equal to the full
    # array dims (Mosaic's (8, 128)-or-full tiling rule).
    rel_hb = rel_bias.T.astype(jnp.float32)[:, None, :]  # [H, 1, nb]
    mask3 = mask.astype(jnp.int32)[:, None, :]  # [B, 1, L]

    kernel = functools.partial(
        _encoder_attn_kernel,
        num_heads=num_heads,
        num_buckets=num_buckets,
        max_distance=max_distance,
        causal=causal,
    )
    d = inner // num_heads
    flops = 2 * 2 * b * num_heads * l * l * d + 40 * b * num_heads * l * l
    # Grid order: q-block MAJOR, batch minor — the bias scratch built at
    # bi == 0 serves every batch cell of that q-block. The [H, BQ, L] fp32
    # scratch (up to ~13 MB at BQ=512, L=1024) plus working tiles exceeds
    # the conservative 16 MB default, so raise the Mosaic VMEM budget
    # (v5e has 128 MB VMEM per core).
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, inner), q.dtype),
        grid=(l // block_q, b),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, inner),
                lambda qi, bi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, l, inner), lambda qi, bi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, l, inner), lambda qi, bi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, l), lambda qi, bi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_heads, 1, rel_hb.shape[2]),
                lambda qi, bi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, inner),
            lambda qi, bi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((num_heads, block_q, l), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=q.size * 8,
            transcendentals=b * num_heads * l * l,
        ),
        interpret=interpret,
    )(q, k, v, mask3, rel_hb)


# ------------------------------------------------------------------ #
# Backward kernels
# ------------------------------------------------------------------ #


def _bwd_dq_kernel(
    q_ref: jax.Array,  # [1, 1, BQ, d]
    k_ref: jax.Array,  # [1, 1, L, d]
    v_ref: jax.Array,  # [1, 1, L, d]
    do_ref: jax.Array,  # [1, 1, BQ, d]
    mask_ref: jax.Array,  # [1, 1, L] int32
    rel_ref: jax.Array,  # [H, 1, nb] fp32 in SMEM
    delta_ref: jax.Array,  # [1, 1, 1, BQ] fp32 — rowsum(dO*O), precomputed in XLA
    dq_ref: jax.Array,  # [1, 1, BQ, d]
    lse_ref: jax.Array,  # [1, 1, 1, BQ] fp32
    db_ref: jax.Array,  # [H, 1, nb] fp32 in SMEM — revisited across the whole grid
    bias_ref: jax.Array,  # [BQ, L] fp32 VMEM scratch — persists over bi
    dsacc_ref: jax.Array,  # [BQ, L] fp32 VMEM scratch — dS summed over bi
    *,
    num_buckets: int,
    max_distance: int,
    causal: bool = False,
) -> None:
    block_q = q_ref.shape[2]
    kv_len = k_ref.shape[2]
    h, qi, bi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    num_b = pl.num_programs(2)

    mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, L]
    if causal:
        mask_bias = mask_bias + jnp.where(
            _causal_invalid(qi * block_q, block_q, kv_len), NEG_INF, 0.0
        )

    @pl.when(jnp.logical_and(bi == 0, qi == 0))
    def _init_dbias():
        for b in range(num_buckets):
            db_ref[h, 0, b] = 0.0

    # Batch runs fastest: the (h, q-block)-dependent bias tile is built
    # once into a persistent scratch and reused across all batch cells
    # (same hoist as the forward kernel).
    @pl.when(bi == 0)
    def _build_bias():
        bucket = _bucket_map(
            qi * block_q, block_q, kv_len, num_buckets, max_distance,
            bidirectional=not causal,
        )
        bias_ref[...] = _bias_tile(
            bucket, lambda b: rel_ref[h, 0, b], num_buckets, chunked=True
        )

    qh, kh, vh, doh = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]

    scores = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores += bias_ref[...] + mask_bias

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l_ = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / l_  # fp32 [BQ, L]
    lse_ref[0, 0, 0, :] = (m + jnp.log(l_))[:, 0]

    dp = jax.lax.dot_general(
        doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, L]
    delta = delta_ref[0, 0, 0, :][:, None]  # [BQ, 1]
    ds = probs * (dp - delta)  # fp32 [BQ, L]

    dq_ref[0, 0] = jax.lax.dot_general(
        ds.astype(qh.dtype), kh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    # Relative-bias gradient: bias is shared across all (i, j) with the
    # same bucket, so d_bias[h, b] = sum of dS over that bucket's cells.
    # dS sums over the batch FIRST (a [BQ, L] add per cell into a
    # persistent scratch); the 32-way masked-sum chain — as expensive as
    # the bias chain itself — then runs once per (head, q-block) on the
    # accumulated tile at the last batch cell, not per cell. Column-
    # chunked: the chain's temporaries otherwise overflow the VMEM stack
    # at L=2304 (measured 27.6M).
    @pl.when(bi == 0)
    def _init_dsacc():
        dsacc_ref[...] = ds

    @pl.when(bi > 0)
    def _acc_dsacc():
        dsacc_ref[...] += ds

    @pl.when(bi == num_b - 1)
    def _reduce_dbias():
        bucket = _bucket_map(
            qi * block_q, block_q, kv_len, num_buckets, max_distance,
            bidirectional=not causal,
        )
        chunk = _chunk_cols(kv_len)
        for b in range(num_buckets):
            acc = None
            for c0 in range(0, kv_len, chunk):
                part = jnp.sum(
                    jnp.where(
                        bucket[:, c0 : c0 + chunk] == b,
                        dsacc_ref[:, c0 : c0 + chunk],
                        0.0,
                    )
                )
                acc = part if acc is None else acc + part
            db_ref[h, 0, b] += acc


def _bwd_dkv_kernel(
    k_ref: jax.Array,  # [1, 1, BK, d]
    v_ref: jax.Array,  # [1, 1, BK, d]
    q_ref: jax.Array,  # [1, 1, L, d]
    do_ref: jax.Array,  # [1, 1, L, d]
    mask_ref: jax.Array,  # [1, 1, BK] int32 — kv-side mask for this block's rows
    rel_ref: jax.Array,  # [H, 1, nb] fp32 in SMEM
    lse_ref: jax.Array,  # [1, 1, 1, L] fp32
    delta_ref: jax.Array,  # [1, 1, 1, L] fp32
    dk_ref: jax.Array,  # [1, 1, BK, d]
    dv_ref: jax.Array,  # [1, 1, BK, d]
    bias_ref: jax.Array,  # [BK, L] fp32 VMEM scratch — persists over bi
    *,
    num_buckets: int,
    max_distance: int,
    causal: bool = False,
) -> None:
    block_kv = k_ref.shape[2]
    q_len = q_ref.shape[2]
    h, ki, bi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    # Batch runs fastest: the (h, kv-block)-dependent bias tile — including
    # the causal term — is built once into a persistent scratch and reused
    # across all batch cells (same hoist as the forward kernel).
    @pl.when(bi == 0)
    def _build_bias():
        bucket = _bucket_map(
            ki * block_kv, block_kv, q_len, num_buckets, max_distance,
            transposed=True, bidirectional=not causal,
        )
        t = _bias_tile(
            bucket, lambda b: rel_ref[h, 0, b], num_buckets, chunked=True
        )
        if causal:
            t = t + jnp.where(
                _causal_invalid(
                    ki * block_kv, block_kv, q_len, transposed=True
                ),
                NEG_INF,
                0.0,
            )
        bias_ref[...] = t

    # Rows are kv positions here: masked keys score -1e10 so P^T rows vanish
    # exactly (exp underflows to 0), matching the naive path.
    row_bias = jnp.transpose(
        jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)
    )  # [BK, 1]

    kh, vh, qh, doh = k_ref[0, 0], v_ref[0, 0], q_ref[0, 0], do_ref[0, 0]

    scores_t = jax.lax.dot_general(
        kh, qh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, L] — transpose of the forward scores
    scores_t += bias_ref[...] + row_bias

    p_t = jnp.exp(scores_t - lse_ref[0, 0, 0, :][None, :])  # P^T, exact
    dp_t = jax.lax.dot_general(
        vh, doh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, L] = dP^T
    ds_t = p_t * (dp_t - delta_ref[0, 0, 0, :][None, :])

    dv_ref[0, 0] = jax.lax.dot_general(
        p_t.astype(doh.dtype), doh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds_t.astype(qh.dtype), qh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


# ------------------------------------------------------------------ #
# Blockwise backward (long context): LSE recompute + dq/d_bias + dk/dv
# ------------------------------------------------------------------ #


def _block_far_bias(
    bias_scr: jax.Array,  # [rows, cols] fp32 scratch to fill
    get_rel: Callable[[int], jax.Array],
    row_start: jnp.ndarray,
    col_start: jnp.ndarray,
    num_buckets: int,
    max_distance: int,
    transposed: bool,
    causal: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fill ``bias_scr`` for one (q-block, kv-block) pair of the blockwise
    kernels: near-diagonal blocks run the bucket-map select chain, far
    blocks broadcast the saturated per-head constant (T5 buckets saturate
    at ``max_distance`` — see the forward blockwise kernel). Returns
    ``(is_near, far_bucket)`` so the caller can route the d_bias reduction
    the same way.

    Orientation: ``transposed=False`` → rows are queries at ``row_start``,
    cols are keys at ``col_start``; ``transposed=True`` → rows are keys at
    ``row_start``, cols are queries at ``col_start``.

    ``causal=True``: unidirectional buckets, the NEG_INF causal term folds
    into near tiles, and the only reachable far side is the past (callers
    skip all-future blocks entirely), whose saturated bucket is nb - 1.
    """
    rows, cols = bias_scr.shape
    if transposed:
        q0, qn, k0, kn = col_start, cols, row_start, rows
    else:
        q0, qn, k0, kn = row_start, rows, col_start, cols
    right_far = k0 - (q0 + qn - 1) >= max_distance
    left_far = q0 - (k0 + kn - 1) >= max_distance
    is_near = jnp.logical_not(jnp.logical_or(right_far, left_far))
    if causal:
        far_bucket = jnp.full((), num_buckets - 1, jnp.int32)
    else:
        far_bucket = jnp.where(k0 > q0, num_buckets - 1, num_buckets // 2 - 1)

    @pl.when(is_near)
    def _near() -> None:
        bucket = _bucket_map(
            row_start, rows, cols, num_buckets, max_distance,
            transposed=transposed, col_start=col_start,
            bidirectional=not causal,
        )
        t = _bias_tile(bucket, get_rel, num_buckets)
        if causal:
            t = t + jnp.where(
                _causal_invalid(
                    row_start, rows, cols, transposed=transposed,
                    col_start=col_start,
                ),
                NEG_INF,
                0.0,
            )
        bias_scr[...] = t

    @pl.when(jnp.logical_not(is_near))
    def _far() -> None:
        if causal:
            const = get_rel(num_buckets - 1)
        else:
            const = jnp.where(
                k0 > q0,
                get_rel(num_buckets - 1),
                get_rel(num_buckets // 2 - 1),
            )
        bias_scr[...] = jnp.zeros((rows, cols), jnp.float32) + const

    return is_near, far_bucket


def _bwd_lse_kernel_blockwise(
    q_ref: jax.Array,  # [1, BQ, H*d]
    k_ref: jax.Array,  # [1, BK, H*d]
    mask_ref: jax.Array,  # [1, 1, BK] int32
    rel_ref: jax.Array,  # [H, 1, nb] fp32
    lse_ref: jax.Array,  # [1, H, 1, BQ] fp32 — written at last ki
    bias_scr: jax.Array,  # [BQ, BK] fp32
    m_scr: jax.Array,  # [H, BQ] fp32
    l_scr: jax.Array,  # [H, BQ] fp32
    *,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    causal: bool,
) -> None:
    """Online recompute of the forward row log-sum-exp, KV-blocked.

    The full-row dq kernel gets the LSE for free (whole row in VMEM); at
    long context the backward needs it first, so the blockwise path runs
    this cheap sweep (one QK^T matmul, no PV) before dq/dkv.
    """
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]
    d = k_ref.shape[2] // num_heads
    qi, ki = pl.program_id(0), pl.program_id(2)
    nk = pl.num_programs(2)
    q_start = qi * block_q
    k_start = ki * block_kv

    @pl.when(ki == 0)
    def _init() -> None:
        m_scr[...] = jnp.full(m_scr.shape, -1e30, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)

    live = (
        k_start < q_start + block_q
        if causal
        else jnp.full((), True, jnp.bool_)
    )

    @pl.when(live)
    def _compute() -> None:
        mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, BK]

        for h in range(num_heads):
            rel_vec = rel_ref[h, 0]
            _block_far_bias(
                bias_scr, lambda b: rel_vec[b], q_start, k_start,
                num_buckets, max_distance, False, causal,
            )
            qh = q_ref[0, :, h * d : (h + 1) * d]
            kh = k_ref[0, :, h * d : (h + 1) * d]
            scores = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores += bias_scr[...] + mask_bias
            m_prev = m_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
            l_scr[h] = l_scr[h] * jnp.exp(m_prev - m_new) + jnp.sum(
                jnp.exp(scores - m_new[:, None]), axis=-1
            )
            m_scr[h] = m_new

    @pl.when(ki == nk - 1)
    def _emit() -> None:
        for h in range(num_heads):
            lse_ref[0, h, 0, :] = m_scr[h] + jnp.log(l_scr[h])


def _bwd_dq_kernel_blockwise(
    q_ref: jax.Array,  # [1, 1, BQ, d]
    k_ref: jax.Array,  # [1, 1, BK, d]
    v_ref: jax.Array,  # [1, 1, BK, d]
    do_ref: jax.Array,  # [1, 1, BQ, d]
    mask_ref: jax.Array,  # [1, 1, BK] int32
    rel_ref: jax.Array,  # [H, 1, nb] fp32 in SMEM
    lse_ref: jax.Array,  # [1, 1, 1, BQ] fp32
    delta_ref: jax.Array,  # [1, 1, 1, BQ] fp32
    dq_ref: jax.Array,  # [1, 1, BQ, d] — revisited across ki
    db_ref: jax.Array,  # [H, 1, nb] fp32 in SMEM — revisited across the grid
    bias_scr: jax.Array,  # [BQ, BK] fp32
    dq_scr: jax.Array,  # [BQ, d] fp32
    *,
    num_buckets: int,
    max_distance: int,
    causal: bool,
) -> None:
    block_q = q_ref.shape[2]
    block_kv = k_ref.shape[2]
    h, qi, bi, ki = (
        pl.program_id(0), pl.program_id(1), pl.program_id(2), pl.program_id(3)
    )
    nk = pl.num_programs(3)
    q_start = qi * block_q
    k_start = ki * block_kv

    @pl.when(
        jnp.logical_and(
            jnp.logical_and(qi == 0, bi == 0), ki == 0
        )
    )
    def _init_dbias() -> None:
        for b in range(num_buckets):
            db_ref[h, 0, b] = 0.0

    @pl.when(ki == 0)
    def _init_dq() -> None:
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    live = (
        k_start < q_start + block_q
        if causal
        else jnp.full((), True, jnp.bool_)
    )

    @pl.when(live)
    def _compute() -> None:
        is_near, far_bucket = _block_far_bias(
            bias_scr, lambda b: rel_ref[h, 0, b], q_start, k_start,
            num_buckets, max_distance, False, causal,
        )

        mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, BK]
        qh, kh, vh, doh = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]

        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores += bias_scr[...] + mask_bias

        # Exact probabilities from the recomputed LSE — no running max
        # needed, so dS (and the d_bias reduction) is final per block.
        p = jnp.exp(scores - lse_ref[0, 0, 0, :][:, None])  # [BQ, BK]
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0, 0, :][:, None])  # fp32 [BQ, BK]

        dq_scr[...] += jax.lax.dot_general(
            ds.astype(kh.dtype), kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # d_bias: near blocks reduce through the bucket map (the select
        # chain runs only on the ~3 near-diagonal blocks per q-block —
        # O(N) total); far blocks collapse to one scalar sum into the
        # saturated bucket.
        @pl.when(is_near)
        def _db_near() -> None:
            bucket = _bucket_map(
                q_start, block_q, block_kv, num_buckets, max_distance,
                col_start=k_start, bidirectional=not causal,
            )
            for b in range(num_buckets):
                db_ref[h, 0, b] += jnp.sum(jnp.where(bucket == b, ds, 0.0))

        @pl.when(jnp.logical_not(is_near))
        def _db_far() -> None:
            total = jnp.sum(ds)
            for b in (num_buckets - 1, num_buckets // 2 - 1):
                db_ref[h, 0, b] += jnp.where(far_bucket == b, total, 0.0)

    @pl.when(ki == nk - 1)
    def _emit() -> None:
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel_blockwise(
    k_ref: jax.Array,  # [1, 1, BK, d]
    v_ref: jax.Array,  # [1, 1, BK, d]
    q_ref: jax.Array,  # [1, 1, BQ, d]
    do_ref: jax.Array,  # [1, 1, BQ, d]
    mask_ref: jax.Array,  # [1, 1, BK] int32 — kv-side mask for this block
    rel_ref: jax.Array,  # [H, 1, nb] fp32 in SMEM
    lse_ref: jax.Array,  # [1, 1, 1, BQ] fp32
    delta_ref: jax.Array,  # [1, 1, 1, BQ] fp32
    dk_ref: jax.Array,  # [1, 1, BK, d] — revisited across qi
    dv_ref: jax.Array,  # [1, 1, BK, d]
    bias_scr: jax.Array,  # [BK, BQ] fp32
    dk_scr: jax.Array,  # [BK, d] fp32
    dv_scr: jax.Array,  # [BK, d] fp32
    *,
    num_buckets: int,
    max_distance: int,
    causal: bool,
) -> None:
    block_kv = k_ref.shape[2]
    block_q = q_ref.shape[2]
    h, ki, qi = pl.program_id(0), pl.program_id(1), pl.program_id(3)
    nq = pl.num_programs(3)
    k_start = ki * block_kv
    q_start = qi * block_q

    @pl.when(qi == 0)
    def _init() -> None:
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    # Causal: keys only see queries at or after their position — skip
    # q-blocks entirely before this kv-block.
    live = (
        k_start < q_start + block_q
        if causal
        else jnp.full((), True, jnp.bool_)
    )

    @pl.when(live)
    def _compute() -> None:
        _block_far_bias(
            bias_scr, lambda b: rel_ref[h, 0, b], k_start, q_start,
            num_buckets, max_distance, True, causal,
        )

        row_bias = jnp.transpose(
            jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)
        )  # [BK, 1]
        kh, vh, qh, doh = k_ref[0, 0], v_ref[0, 0], q_ref[0, 0], do_ref[0, 0]

        scores_t = jax.lax.dot_general(
            kh, qh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, BQ]
        scores_t += bias_scr[...] + row_bias

        p_t = jnp.exp(scores_t - lse_ref[0, 0, 0, :][None, :])  # exact
        dp_t = jax.lax.dot_general(
            vh, doh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds_t = p_t * (dp_t - delta_ref[0, 0, 0, :][None, :])

        dv_scr[...] += jax.lax.dot_general(
            p_t.astype(doh.dtype), doh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_scr[...] += jax.lax.dot_general(
            ds_t.astype(qh.dtype), qh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == nq - 1)
    def _emit() -> None:
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _blockwise_backward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    rel_bias: jax.Array,
    out: jax.Array,
    g: jax.Array,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    block_q: int,
    block_kv: int,
    interpret: bool,
    causal: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """KV-blocked backward: O(N) VMEM like the blockwise forward, so
    gradients flow at any HBM-bounded length. Three sweeps: LSE recompute
    (one QK^T pass on the flat layout), then dq/d_bias and dk/dv in the
    head-grid layout with per-block accumulator scratches."""
    b, t, inner = q.shape
    s = k.shape[1]  # rectangular: cross-attention has kv len != q len
    nb = num_buckets
    h = num_heads
    d = inner // h
    block_q = _largest_divisor_block(t, block_q)
    block_kv = _largest_divisor_block(s, block_kv)
    rel_hb = rel_bias.T.astype(jnp.float32)[:, None, :]  # [H, 1, nb]
    mask3 = mask.astype(jnp.int32)[:, None, :]  # [B, 1, S]

    lse = pl.pallas_call(
        functools.partial(
            _bwd_lse_kernel_blockwise,
            num_heads=h, num_buckets=nb, max_distance=max_distance,
            causal=causal,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, t), jnp.float32),
        grid=(t // block_q, b, s // block_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, inner), lambda qi, bi, ki: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, inner), lambda qi, bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv), lambda qi, bi, ki: (bi, 0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1, nb), lambda qi, bi, ki: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, 1, block_q), lambda qi, bi, ki: (bi, 0, 0, qi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, block_kv), jnp.float32),
            pltpu.VMEM((h, block_q), jnp.float32),
            pltpu.VMEM((h, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * t * s * d,
            bytes_accessed=(q.size + k.size) * 2,
            transcendentals=b * h * t * s,
        ),
        interpret=interpret,
    )(q, k, mask3, rel_hb)

    def to_heads(x, ln):  # [B, ln, H*d] -> [B, H, ln, d]
        return x.reshape(b, ln, h, d).transpose(0, 2, 1, 3)

    def to_flat(x, ln):  # [B, H, ln, d] -> [B, ln, H*d]
        return x.transpose(0, 2, 1, 3).reshape(b, ln, inner)

    qh, gh = to_heads(q, t), to_heads(g, t)
    kh, vh = to_heads(k, s), to_heads(v, s)
    delta = jnp.einsum(
        "blhd,blhd->bhl",
        g.reshape(b, t, h, d).astype(jnp.float32),
        out.reshape(b, t, h, d).astype(jnp.float32),
    )[:, :, None, :]  # [B, H, 1, T] fp32

    flops = 5 * 2 * b * h * t * s * d + 60 * b * h * t * s

    dqh, db = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel_blockwise,
            num_buckets=nb, max_distance=max_distance, causal=causal,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((h, 1, nb), jnp.float32),
        ),
        grid=(h, t // block_q, b, s // block_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, qi, bi, ki: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, qi, bi, ki: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv), lambda hi, qi, bi, ki: (bi, 0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, qi, bi, ki: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, qi, bi, ki: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, block_kv), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * 3 // 5,
            bytes_accessed=q.size * 10,
            transcendentals=b * h * t * s,
        ),
        interpret=interpret,
    )(qh, kh, vh, gh, mask3, rel_hb, lse, delta)

    dkh, dvh = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel_blockwise,
            num_buckets=nb, max_distance=max_distance, causal=causal,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
        ),
        grid=(h, s // block_kv, b, t // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, ki, bi, qi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, ki, bi, qi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda hi, ki, bi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda hi, ki, bi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv), lambda hi, ki, bi, qi: (bi, 0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, ki, bi, qi: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, ki, bi, qi: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, ki, bi, qi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, ki, bi, qi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, block_q), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * 2 // 5,
            bytes_accessed=q.size * 10,
            transcendentals=b * h * t * s,
        ),
        interpret=interpret,
    )(kh, vh, qh, gh, mask3, rel_hb, lse, delta)

    d_rel = db[:, 0, :].T.astype(rel_bias.dtype)  # [nb, H]
    return to_flat(dqh, t), to_flat(dkh, s), to_flat(dvh, s), d_rel


def _backward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    rel_bias: jax.Array,
    out: jax.Array,
    g: jax.Array,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    interpret: bool,
    causal: bool = False,
    block_q: int = 1024,
    force_block_q: bool = False,
    block_kv: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Backward pass in the head-grid layout.

    The forward's flat [B, L, H*d] layout with an in-kernel head loop
    overflows the VMEM stack in backward (Mosaic allocates each head
    iteration's temporaries statically: measured 30 MB at L=2304 vs the
    16 MB limit). Heads become a grid dimension instead — one head's
    temporaries per step — at the cost of [B, L, H, d] <-> [B, H, L, d]
    relayouts outside the kernels (~100 MB of HBM traffic per layer at
    L=2304, ~0.15 ms — noise next to the [L, L, d] matmuls).
    """
    # Long context: mirror the forward's dispatch — the full-row kernels
    # below keep the whole KV row per cell and stop fitting VMEM past ~4k.
    if block_kv or q.shape[1] > 4096:
        return _blockwise_backward_impl(
            q, k, v, mask, rel_bias, out, g, num_heads, num_buckets,
            max_distance, 512 if block_q > 512 else block_q,
            block_kv or 512, interpret, causal,
        )
    b, l, inner = q.shape
    nb = num_buckets
    h = num_heads
    d = inner // h
    # ~7 live fp32 [BQ, L] tiles per step (bucket/bias/scores/p/probs/dp/dS).
    block = _pick_block(block_q, l, 28, 8 * 1024 * 1024, force=force_block_q)
    rel_hb = rel_bias.T.astype(jnp.float32)[:, None, :]  # [H, 1, nb]
    mask3 = mask.astype(jnp.int32)[:, None, :]  # [B, 1, L]

    def to_heads(x):  # [B, L, H*d] -> [B, H, L, d]
        return x.reshape(b, l, h, d).transpose(0, 2, 1, 3)

    def to_flat(x):  # [B, H, L, d] -> [B, L, H*d]
        return x.transpose(0, 2, 1, 3).reshape(b, l, inner)

    qh, kh, vh, gh = to_heads(q), to_heads(k), to_heads(v), to_heads(g)

    # delta_i = rowsum(P * dP)_i == (dO_i . O_i) — computed from the saved
    # forward output with one fused elementwise+reduce, no [L, L] tensor.
    delta = jnp.einsum(
        "blhd,blhd->bhl",
        g.reshape(b, l, h, d).astype(jnp.float32),
        out.reshape(b, l, h, d).astype(jnp.float32),
    )[:, :, None, :]  # [B, H, 1, L] fp32 (singleton keeps blocks tileable)

    # Backward ~2.5x forward FLOPs (5 [L,L,d]-class matmuls vs 2).
    flops = 5 * 2 * b * h * l * l * d + 60 * b * h * l * l

    dq_kernel = functools.partial(
        _bwd_dq_kernel, num_buckets=num_buckets, max_distance=max_distance,
        causal=causal,
    )
    dqh, lse, db = pl.pallas_call(
        dq_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, l), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, nb), jnp.float32),
        ),
        grid=(h, l // block, b),
        in_specs=[
            pl.BlockSpec((1, 1, block, d), lambda hi, qi, bi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l, d), lambda hi, qi, bi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l, d), lambda hi, qi, bi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, d), lambda hi, qi, bi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda hi, qi, bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, block), lambda hi, qi, bi: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block, d), lambda hi, qi, bi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block), lambda hi, qi, bi: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block, l), jnp.float32),
            pltpu.VMEM((block, l), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * 3 // 5,
            bytes_accessed=q.size * 10,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(qh, kh, vh, gh, mask3, rel_hb, delta)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, num_buckets=num_buckets, max_distance=max_distance,
        causal=causal,
    )
    dkh, dvh = pl.pallas_call(
        dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, l, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, l, d), v.dtype),
        ),
        grid=(h, l // block, b),
        in_specs=[
            pl.BlockSpec((1, 1, block, d), lambda hi, ki, bi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, d), lambda hi, ki, bi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l, d), lambda hi, ki, bi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l, d), lambda hi, ki, bi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda hi, ki, bi: (bi, 0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, l), lambda hi, ki, bi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, l), lambda hi, ki, bi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block, d), lambda hi, ki, bi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, d), lambda hi, ki, bi: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((block, l), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * 2 // 5,
            bytes_accessed=q.size * 10,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(kh, vh, qh, gh, mask3, rel_hb, lse, delta)

    d_rel = db[:, 0, :].T.astype(rel_bias.dtype)  # [nb, H]
    return to_flat(dqh), to_flat(dkh), to_flat(dvh), d_rel


# ------------------------------------------------------------------ #
# custom_vjp wiring
# ------------------------------------------------------------------ #


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12)
)
def _flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    rel_bias: jax.Array,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    block_q: int,
    interpret: bool,
    causal: bool,
    force_block_q: bool,
    block_kv: int,
) -> jax.Array:
    return _forward_impl(
        q, k, v, mask, rel_bias, num_heads, num_buckets, max_distance,
        block_q, interpret, causal, force_block_q, block_kv,
    )


def _flash_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    rel_bias: jax.Array,
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    block_q: int,
    interpret: bool,
    causal: bool,
    force_block_q: bool,
    block_kv: int,
) -> tuple[jax.Array, tuple[jax.Array, ...]]:
    out = _forward_impl(
        q, k, v, mask, rel_bias, num_heads, num_buckets, max_distance,
        block_q, interpret, causal, force_block_q, block_kv,
    )
    # Flash-style residuals: inputs + output, never the [L, L] intermediates.
    return out, (q, k, v, mask, rel_bias, out)


def _flash_bwd(
    num_heads: int,
    num_buckets: int,
    max_distance: int,
    block_q: int,
    interpret: bool,
    causal: bool,
    force_block_q: bool,
    block_kv: int,
    res: tuple[jax.Array, ...],
    g: jax.Array,
) -> tuple[jax.Array, ...]:
    q, k, v, mask, rel_bias, out = res
    dq, dk, dv, d_rel = _backward_impl(
        q, k, v, mask, rel_bias, out, g, num_heads, num_buckets, max_distance,
        interpret, causal, block_q, force_block_q, block_kv,
    )
    if jnp.issubdtype(mask.dtype, jnp.floating):
        dmask = jnp.zeros_like(mask)
    else:  # integer mask: the cotangent space is float0
        dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return dq, dk, dv, dmask, d_rel


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads",
        "num_buckets",
        "max_distance",
        "block_q",
        "interpret",
        "force_block_q",
        "block_kv",
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
    force_block_q: bool = False,
    block_kv: int = 0,
) -> jnp.ndarray:
    """Fused bidirectional T5 self-attention -> [B, L, H*d]. Differentiable
    (custom VJP with Pallas backward kernels) — usable in training.

    ``block_kv`` > 0 (or any L > 4096) selects the KV-blocked online-softmax
    kernels: O(N) VMEM, so single-chip context length is bounded by HBM —
    the survey's blockwise long-context design (SURVEY.md §5). The backward
    mirrors it (LSE-recompute sweep + blockwise dq/d_bias and dk/dv), so
    training works at the same lengths; reference shapes (<= 2304) keep the
    measured full-row kernels.
    """
    return _flash_attention(
        q, k, v, mask, rel_bias, num_heads, num_buckets, max_distance,
        block_q, interpret, False, force_block_q, block_kv,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads",
        "num_buckets",
        "max_distance",
        "block_q",
        "interpret",
        "block_kv",
    ),
)
def causal_flash_attention(
    q: jnp.ndarray,  # [B, T, H*d] — raw projection layout
    k: jnp.ndarray,  # [B, T, H*d]
    v: jnp.ndarray,  # [B, T, H*d]
    rel_bias: jnp.ndarray,  # [num_buckets, H] fp32 (HF layout)
    num_heads: int,
    num_buckets: int = 32,
    max_distance: int = 128,
    block_q: int = 512,
    interpret: bool = False,
    block_kv: int = 0,
) -> jnp.ndarray:
    """Fused causal T5 decoder self-attention -> [B, T, H*d].

    Differentiable (custom VJP, same backward kernels as the encoder with
    unidirectional buckets + causal masking). Replaces the teacher-forced
    decoder's naive path, which materializes a [B, H, T, T] score tensor in
    HBM — recomputed in the backward under remat
    (the role of torch attention in `/root/reference/generation/model.py:101-111`).

    No padding mask: HF T5 training feeds the decoder causal-only attention
    (pad positions are excluded via the -100 label mask instead), and the
    naive :func:`reprover_tpu.models.t5.decode` does the same when
    ``decoder_mask is None``.
    """
    ones = jnp.ones((q.shape[0], q.shape[1]), jnp.int32)
    return _flash_attention(
        q, k, v, ones, rel_bias, num_heads, num_buckets, max_distance,
        block_q, interpret, True, False, block_kv,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "block_q", "interpret", "block_kv"),
)
def scaled_causal_flash_attention(
    q: jnp.ndarray,  # [B, T, H*d] — raw projection layout (RoPE pre-applied)
    k: jnp.ndarray,  # [B, T, H*d] — GQA heads pre-repeated to H
    v: jnp.ndarray,  # [B, T, H*d]
    key_mask: jnp.ndarray,  # [B, T] int {0,1} — padding mask over keys
    num_heads: int,
    scale: float,
    block_q: int = 512,
    interpret: bool = False,
    block_kv: int = 0,
) -> jnp.ndarray:
    """Causal self-attention with 1/sqrt(d) scaling and a key padding mask,
    no positional bias — the RoPE-family (LLaMA) teacher-forced form:
    rotation is elementwise and applied to q/k upstream, so the kernel
    need not know about it. Replaces the naive path's [B, H, T, T] score
    and causal-bias materializations in `models/causal_lm.forward_logits`.

    Reuses the T5 causal kernels with a zero bias table (the hoisted
    select chain over zeros is built once per q-block — noise); the scale
    folds into q exactly (softmax((q*s)k^T) == softmax((q k^T)*s), and at
    d=64 s=1/8 is a pure exponent shift in bf16). Differentiable: the
    custom-VJP backward handles causal + key-mask together.
    """
    zeros = jnp.zeros((32, num_heads), jnp.float32)
    return _flash_attention(
        (q.astype(jnp.float32) * scale).astype(q.dtype), k, v, key_mask,
        zeros, num_heads, 32, 128, block_q, interpret, True, False, block_kv,
    )


# ------------------------------------------------------------------ #
# Cross-attention kernels (encoder-decoder, no positional bias)
# ------------------------------------------------------------------ #


def _cross_attn_kernel(
    q_ref: jax.Array,  # [1, BQ, H*d]
    k_ref: jax.Array,  # [1, S, H*d]
    v_ref: jax.Array,  # [1, S, H*d]
    mask_ref: jax.Array,  # [1, 1, S] int32
    out_ref: jax.Array,  # [1, BQ, H*d]
    *,
    num_heads: int,
) -> None:
    d = k_ref.shape[2] // num_heads
    mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, S]

    for h in range(num_heads):
        qh = q_ref[0, :, h * d : (h + 1) * d]
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]

        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, S] fp32 (T5: unscaled)
        scores += mask_bias

        # Exact fp32 softmax; the 1/l normalization rides the [BQ, d]
        # output instead of the [BQ, S] probs tile (same math).
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)

        out_ref[0, :, h * d : (h + 1) * d] = (
            jnp.dot(
                p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
            )
            / l
        ).astype(out_ref.dtype)


def _cross_forward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_heads: int,
    block_q: int,
    interpret: bool,
    block_kv: int = 0,
) -> jax.Array:
    b, t, inner = q.shape
    s = k.shape[1]
    # Long context (either side): the KV-blocked kernel with a zero bias
    # table IS cross-attention — T5 cross carries no positional bias.
    if block_kv or s > 4096 or t > 4096:
        zeros = jnp.zeros((32, num_heads), jnp.float32)
        return _blockwise_forward_impl(
            q, k, v, mask, zeros, num_heads, 32, 128,
            512 if block_q > 512 else block_q, block_kv or 512, interpret,
            False,
        )
    # ~3 live fp32 [BQ, S] tiles per head iteration (scores, exp, probs).
    block_q = _pick_block(block_q, t, 12, 8 * 1024 * 1024, tile_cols=s)
    mask3 = mask.astype(jnp.int32)[:, None, :]  # [B, 1, S]
    d = inner // num_heads
    flops = 2 * 2 * b * num_heads * t * s * d + 20 * b * num_heads * t * s
    return pl.pallas_call(
        functools.partial(_cross_attn_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, t, inner), q.dtype),
        grid=(b, t // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, inner), lambda bi, qi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, inner), lambda bi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, inner), lambda bi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, inner), lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * 4,
            transcendentals=b * num_heads * t * s,
        ),
        interpret=interpret,
    )(q, k, v, mask3)


def _cross_bwd_dq_kernel(
    q_ref: jax.Array,  # [1, 1, BQ, d]
    k_ref: jax.Array,  # [1, 1, S, d]
    v_ref: jax.Array,  # [1, 1, S, d]
    do_ref: jax.Array,  # [1, 1, BQ, d]
    mask_ref: jax.Array,  # [1, 1, S] int32
    delta_ref: jax.Array,  # [1, 1, 1, BQ] fp32
    dq_ref: jax.Array,  # [1, 1, BQ, d]
    lse_ref: jax.Array,  # [1, 1, 1, BQ] fp32
) -> None:
    mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, S]
    qh, kh, vh, doh = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]

    scores = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S]
    scores += mask_bias

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l_ = jnp.sum(p, axis=-1, keepdims=True)
    probs = p / l_
    lse_ref[0, 0, 0, :] = (m + jnp.log(l_))[:, 0]

    dp = jax.lax.dot_general(
        doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S]
    delta = delta_ref[0, 0, 0, :][:, None]
    ds = probs * (dp - delta)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds.astype(qh.dtype), kh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _cross_bwd_dkv_kernel(
    k_ref: jax.Array,  # [1, 1, BK, d]
    v_ref: jax.Array,  # [1, 1, BK, d]
    q_ref: jax.Array,  # [1, 1, T, d]
    do_ref: jax.Array,  # [1, 1, T, d]
    mask_ref: jax.Array,  # [1, 1, BK] int32 — kv-side mask for this block
    lse_ref: jax.Array,  # [1, 1, 1, T] fp32
    delta_ref: jax.Array,  # [1, 1, 1, T] fp32
    dk_ref: jax.Array,  # [1, 1, BK, d]
    dv_ref: jax.Array,  # [1, 1, BK, d]
) -> None:
    row_bias = jnp.transpose(
        jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)
    )  # [BK, 1]
    kh, vh, qh, doh = k_ref[0, 0], v_ref[0, 0], q_ref[0, 0], do_ref[0, 0]

    scores_t = jax.lax.dot_general(
        kh, qh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, T]
    scores_t += row_bias

    p_t = jnp.exp(scores_t - lse_ref[0, 0, 0, :][None, :])  # P^T, exact
    dp_t = jax.lax.dot_general(
        vh, doh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, T] = dP^T
    ds_t = p_t * (dp_t - delta_ref[0, 0, 0, :][None, :])

    dv_ref[0, 0] = jax.lax.dot_general(
        p_t.astype(doh.dtype), doh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds_t.astype(qh.dtype), qh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _cross_backward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    out: jax.Array,
    g: jax.Array,
    num_heads: int,
    interpret: bool,
    block_kv: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Cross-attention backward in the head-grid layout (cf.
    :func:`_backward_impl` — same scheme minus the position-bias grad)."""
    b, t, inner = q.shape
    s = k.shape[1]
    if block_kv or s > 4096 or t > 4096:
        zeros = jnp.zeros((32, num_heads), jnp.float32)
        dq, dk, dv, _ = _blockwise_backward_impl(
            q, k, v, mask, zeros, out, g, num_heads, 32, 128,
            512, block_kv or 512, interpret, False,
        )
        return dq, dk, dv
    h = num_heads
    d = inner // h
    # ~6 live fp32 tiles per step in each kernel.
    block_q = _pick_block(1024, t, 24, 8 * 1024 * 1024, tile_cols=s)
    block_kv = _pick_block(1024, s, 24, 8 * 1024 * 1024, tile_cols=t)
    mask3 = mask.astype(jnp.int32)[:, None, :]  # [B, 1, S]

    def to_heads(x, ln):  # [B, ln, H*d] -> [B, H, ln, d]
        return x.reshape(b, ln, h, d).transpose(0, 2, 1, 3)

    def to_flat(x, ln):  # [B, H, ln, d] -> [B, ln, H*d]
        return x.transpose(0, 2, 1, 3).reshape(b, ln, inner)

    qh, gh = to_heads(q, t), to_heads(g, t)
    kh, vh = to_heads(k, s), to_heads(v, s)

    delta = jnp.einsum(
        "blhd,blhd->bhl",
        g.reshape(b, t, h, d).astype(jnp.float32),
        out.reshape(b, t, h, d).astype(jnp.float32),
    )[:, :, None, :]  # [B, H, 1, T] fp32

    flops = 5 * 2 * b * h * t * s * d + 30 * b * h * t * s

    dqh, lse = pl.pallas_call(
        _cross_bwd_dq_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t), jnp.float32),
        ),
        grid=(h, b, t // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hi, bi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda hi, bi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda hi, bi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda hi, bi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda hi, bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, bi, qi: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hi, bi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda hi, bi, qi: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * 3 // 5,
            bytes_accessed=(q.size + k.size + v.size) * 8,
            transcendentals=b * h * t * s,
        ),
        interpret=interpret,
    )(qh, kh, vh, gh, mask3, delta)

    dkh, dvh = pl.pallas_call(
        _cross_bwd_dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
        ),
        grid=(h, b, s // block_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, bi, ki: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, bi, ki: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, d), lambda hi, bi, ki: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, d), lambda hi, bi, ki: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv), lambda hi, bi, ki: (bi, 0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t), lambda hi, bi, ki: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t), lambda hi, bi, ki: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, bi, ki: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, d), lambda hi, bi, ki: (bi, hi, ki, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * 2 // 5,
            bytes_accessed=(q.size + k.size + v.size) * 8,
            transcendentals=b * h * t * s,
        ),
        interpret=interpret,
    )(kh, vh, qh, gh, mask3, lse, delta)

    return to_flat(dqh, t), to_flat(dkh, s), to_flat(dvh, s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_heads: int,
    block_q: int,
    interpret: bool,
    block_kv: int,
) -> jax.Array:
    return _cross_forward_impl(
        q, k, v, mask, num_heads, block_q, interpret, block_kv
    )


def _cross_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_heads: int,
    block_q: int,
    interpret: bool,
    block_kv: int,
) -> tuple[jax.Array, tuple[jax.Array, ...]]:
    out = _cross_forward_impl(
        q, k, v, mask, num_heads, block_q, interpret, block_kv
    )
    return out, (q, k, v, mask, out)


def _cross_bwd(
    num_heads: int,
    block_q: int,
    interpret: bool,
    block_kv: int,
    res: tuple[jax.Array, ...],
    g: jax.Array,
) -> tuple[jax.Array, ...]:
    q, k, v, mask, out = res
    dq, dk, dv = _cross_backward_impl(
        q, k, v, mask, out, g, num_heads, interpret, block_kv
    )
    if jnp.issubdtype(mask.dtype, jnp.floating):
        dmask = jnp.zeros_like(mask)
    else:
        dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return dq, dk, dv, dmask


_cross_attention.defvjp(_cross_fwd, _cross_bwd)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "interpret", "block_kv")
)
def cross_flash_attention(
    q: jnp.ndarray,  # [B, T, H*d] — decoder-side queries, raw projection layout
    k: jnp.ndarray,  # [B, S, H*d] — encoder-side keys
    v: jnp.ndarray,  # [B, S, H*d]
    mask: jnp.ndarray,  # [B, S] int {0,1} — encoder padding mask
    num_heads: int,
    block_q: int = 512,
    interpret: bool = False,
    block_kv: int = 0,
) -> jnp.ndarray:
    """Fused encoder-decoder cross-attention -> [B, T, H*d]. Differentiable.

    T5 cross-attention carries no positional bias — only the encoder padding
    mask. Replaces the teacher-forced decoder's naive path, whose
    [B, H, T, S] score tensor (S = 2304 at the reference generation config)
    is the single largest HBM round-trip in the training graph, recomputed
    again in the backward under remat.
    """
    return _cross_attention(
        q, k, v, mask, num_heads, block_q, interpret, block_kv
    )
