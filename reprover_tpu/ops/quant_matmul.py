"""Pallas TPU kernels: weight-only int8 (w8a16) and int4 (w4a16) matmuls.

XLA lowers ``x @ wq.astype(bf16)`` by materializing the converted weight
tensor, so the plain-XLA int8 path reads int8 AND writes+reads a bf16 copy —
measured no faster than bf16 weights. These kernels keep the promise of
weight-only quantization: the quantized tile is DMA'd from HBM, converted in
VMEM, fed to the MXU, and scaled — HBM sees 1/2 (int8) or 1/4 (int4) of the
weight bytes, which is the bound on small-batch incremental decode.

    w8a16:  y[M, N] = (x[M, K] @ q[K, N]) * scale[N]
    w4a16:  y[M, N] =  x[M, K] @ (unpack4(p[K/2, N]) * scale[K/G, N])
            (two 4-bit values per byte along K; per-group-of-G scales,
             applied BEFORE the dot — with scales varying along the
             contraction axis the per-channel post-scale trick no longer
             factors out)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref: jnp.ndarray,
    q_ref: jnp.ndarray,
    scale_ref: jnp.ndarray,
    out_ref: jnp.ndarray,
    *,
    out_dtype: jnp.dtype,
) -> None:
    x = x_ref[:]  # [M, K]
    w = q_ref[:].astype(x.dtype)  # [K, BN] int8 -> compute dtype, in VMEM
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    out_ref[:] = (y * scale_ref[0].astype(jnp.float32)).astype(out_dtype)


def _block_n(n: int) -> int:
    for cand in (512, 384, 256, 128):
        if n % cand == 0:
            return cand
    return n  # odd N (e.g. 1472): single full tile


# Rows per x tile when M is large. Small-M calls (incremental decode, the
# kernel's design point) keep a single full-M tile; prompt-length calls
# (e.g. M=2044 in the engine's admission program) must block over M or the
# x tile alone (M*K*2 bytes) blows the ~16 MB scoped-VMEM stack — observed
# as a compile-time "scoped allocation ... exceeded scoped vmem limit" on
# the 7B admission program. 512 rows * K=4096 * 2 B = 4 MB/tile.
_BLOCK_M = 512


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    q: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] fp32 (per output channel)
    out_dtype: jnp.dtype | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    m, k = x.shape
    k2, n = q.shape
    assert k == k2, (x.shape, q.shape)
    out_dtype = out_dtype or x.dtype
    bn = _block_n(n)
    scale2 = scale.reshape(1, n).astype(jnp.float32)

    # Block over M past _BLOCK_M rows; pad M to the block multiple (zero
    # rows, dropped by the slice below). The pad feeding a pallas_call is
    # materialized as a copy of x, not fused — at most one extra block of
    # rows, negligible next to the int8 weight stream this kernel exists
    # to serve.
    m_pad = m
    if m > _BLOCK_M:
        m_pad = -(-m // _BLOCK_M) * _BLOCK_M
        if m_pad != m:
            x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    bm = min(m_pad, _BLOCK_M)

    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        # M outer / N inner: the x tile stays resident across a row of N
        # blocks (its index map is constant in j), so x is fetched once
        # per M block and the int8 weight stream stays the dominant DMA.
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            # weight tiles are re-fetched once per M block (the x tile, not
            # the weight tile, is what stays resident across the inner N
            # sweep), so the int8 stream costs k*n per M block
            bytes_accessed=m_pad * k * 2
            + k * n * (m_pad // bm)
            + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scale2)
    return out[:m] if m_pad != m else out


# ------------------------------------------------------------------ #
# w4a16: packed int4 weights, per-group scales
# ------------------------------------------------------------------ #


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., K/2, N] uint8 -> [..., K, N] int32 in [-8, 7].

    Row ``2i`` of the logical weight lives in the LOW nibble of packed row
    ``i``, row ``2i+1`` in the HIGH nibble; ``(v ^ 8) - 8`` sign-extends a
    4-bit two's-complement nibble. Shared by the Pallas kernel and the XLA
    dequant path so pack/unpack can never drift apart."""
    p = packed.astype(jnp.int32)
    low = ((p & 15) ^ 8) - 8
    high = ((p >> 4) ^ 8) - 8
    stacked = jnp.stack([low, high], axis=-2)  # [..., K/2, 2, N]
    return stacked.reshape(
        *packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1]
    )


def _kernel4(
    x_ref: jnp.ndarray,
    p_ref: jnp.ndarray,
    scale_ref: jnp.ndarray,
    out_ref: jnp.ndarray,
    acc_ref: jnp.ndarray,
    *,
    group: int,
    out_dtype: jnp.dtype,
    nk: int,
) -> None:
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init() -> None:
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [BM, BK]
    w_int = unpack_int4(p_ref[:])  # [BK, BN] int32, in VMEM
    s = scale_ref[:]  # [BK//group, BN] f32
    s_full = jnp.broadcast_to(
        s[:, None, :], (s.shape[0], group, s.shape[1])
    ).reshape(s.shape[0] * group, s.shape[1])
    w = (w_int.astype(jnp.float32) * s_full).astype(x.dtype)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _flush() -> None:
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _block_k4(k: int, group: int) -> int:
    # Unlike the int8 kernel (whose int8->bf16 convert Mosaic fuses into
    # the dot, so a whole [K, BN] column tile compiles at 7B geometry),
    # the int4 unpack MATERIALIZES int32 intermediates — a whole-K tile
    # blows scoped VMEM at 13B geometry. Block the contraction axis and
    # accumulate in an f32 scratch (standard revisited-output matmul).
    # The scale tile's sublane dim is BK/group, which Mosaic requires to
    # be a multiple of 8 (or the full array) — quantize_weight4 picks the
    # group so a legal BK exists for every K > 2048.
    if k <= 2048:
        return k
    for cand in (2048, 1536, 1024, 512, 256):
        if k % cand == 0 and cand % (8 * group) == 0:
            return cand
    return k  # no usable divisor: single K tile (small-model fallback)


def _block_n4(bk: int, n: int) -> int:
    # Cap the materialized int32 unpack tile ([BK, BN], plus its f32
    # dequant sibling) at ~3 MB so the whole tile set (x, packed, scales,
    # acc, double buffering) stays well inside the ~16 MB scoped-VMEM
    # stack even at 13B-geometry K blocks.
    budget = 3 * 2 ** 20
    for cand in (512, 384, 256, 128):
        if n % cand == 0 and bk * cand * 4 <= budget:
            return cand
    for cand in (64, 32, 16, 8):
        if n % cand == 0:
            return cand
    return n


@functools.partial(
    jax.jit, static_argnames=("group", "out_dtype", "interpret")
)
def quant4_matmul(
    x: jnp.ndarray,  # [M, K] bf16/fp32
    packed: jnp.ndarray,  # [K/2, N] uint8 (two int4 per byte along K)
    scale: jnp.ndarray,  # [K/group, N] fp32 (per K-group, per channel)
    group: int,
    out_dtype: jnp.dtype | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant4(packed, scale). Same M/N grid discipline as
    :func:`quant_matmul`; the packed int4 stream is the dominant DMA at
    quarter the bf16 bytes."""
    m, k2 = x.shape
    kp, n = packed.shape
    assert k2 == kp * 2, (x.shape, packed.shape)
    assert k2 % group == 0 and scale.shape == (k2 // group, n), (
        scale.shape,
        k2,
        group,
        n,
    )
    out_dtype = out_dtype or x.dtype
    bk = _block_k4(k2, group)
    bn = _block_n4(bk, n)
    nk = k2 // bk
    scale = scale.astype(jnp.float32)

    m_pad = m
    if m > _BLOCK_M:
        m_pad = -(-m // _BLOCK_M) * _BLOCK_M
        if m_pad != m:
            x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    bm = min(m_pad, _BLOCK_M)

    out = pl.pallas_call(
        functools.partial(
            _kernel4, group=group, out_dtype=out_dtype, nk=nk
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        # K innermost: the f32 scratch accumulates across K blocks and
        # flushes to the (revisited) out tile on the last one.
        grid=(m_pad // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec(
                (bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // group, bn),
                lambda i, j, kk: (kk, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k2 * n,
            # packed int4 + scale tiles are re-fetched once per M block
            bytes_accessed=m_pad * k2 * 2
            + (kp * n + (k2 // group) * n * 4) * (m_pad // bm)
            + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, packed, scale)
    return out[:m] if m_pad != m else out
