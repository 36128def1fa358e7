"""Pallas TPU kernel: weight-only int8 matmul (w8a16).

XLA lowers ``x @ wq.astype(bf16)`` by materializing the converted weight
tensor, so the plain-XLA int8 path reads int8 AND writes+reads a bf16 copy —
measured no faster than bf16 weights. This kernel keeps the promise of
weight-only quantization: the int8 tile is DMA'd from HBM, converted in
VMEM, fed to the MXU, and scaled per output channel — HBM sees half the
weight bytes, which is the bound on small-batch incremental decode.

    y[M, N] = (x[M, K] @ q[K, N]) * scale[N]
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
