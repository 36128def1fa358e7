"""Per-beam KV-cache reorder+append as a Pallas scalar-prefetch gather.

The engines' beam advance must permute the per-beam decode KV caches by
the continuation parents and install the step's fresh (lazy-append) column
(`reprover_tpu/generation/engine.py::reorder_append` — the vLLM
beam-fork role, `/root/reference/prover/proof_search.py:332-366`).

STATUS (round 4): NOT the production path anymore. Honest re-measurement
with both caches chained through the loop carry (the earlier microbench
let XLA dead-code-eliminate the v half) puts this kernel at ~157 GB/s
effective vs the one-hot einsum's ~300 at the exact engine shape
[8,8,64,8,128,64] on a real v5e — the einsum is 2x faster AND is the same
program GSPMD partitions under a TP mesh, so the engines now default to
`reorder_mode="auto"` (einsum below ~1 GiB of KV cache, the layer-blocked
in-place scan above — see `engine.py::AUTO_SCAN_CACHE_BYTES`). The
kernel is kept as an alternative (`engine_step(..., reorder_mode="gather")`)
because its cost model is different (pure per-row DMA, no MXU) and may win
on other hardware generations; re-measure before re-enabling.

Exactness: identical to the einsum path (`tests/test_beam_reorder.py`
compares both, plus interpret-mode CPU runs). Like the einsum path, the
fresh column is installed for frozen slots too — their ``pos`` column is
never read (attention masks t < pos) and is overwritten by the next real
step.

Single-device only: under a TP mesh the caches are sharded over heads and
the engines keep the einsum path (GSPMD partitions it; a pallas_call would
need a shard_map wrapper).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reorder_kernel(
    parent_ref: jax.Array,  # [S, K] int32 (SMEM, scalar-prefetched)
    pos_ref: jax.Array,  # [S] int32 (SMEM, scalar-prefetched)
    k_ref: jax.Array,  # [LC, 1, 1, H, T, d] — parent's rows (both caches
    v_ref: jax.Array,  # gathered by the same index map)
    kcol_ref: jax.Array,  # [LC, 1, 1, H, 1, d]
    vcol_ref: jax.Array,
    ko_ref: jax.Array,  # [LC, 1, 1, H, T, d]
    vo_ref: jax.Array,
) -> None:
    s = pl.program_id(0)
    T = k_ref.shape[4]
    at_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, T, 1), 4)
        == pos_ref[s]
    )
    ko_ref[...] = jnp.where(at_pos, kcol_ref[...], k_ref[...])
    vo_ref[...] = jnp.where(at_pos, vcol_ref[...], v_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def reorder_append_gather(
    k_cache: jnp.ndarray,  # [L, S, K, H, T, d]
    v_cache: jnp.ndarray,
    k_col: jnp.ndarray,  # [L, S, K, H, 1, d]
    v_col: jnp.ndarray,
    cont_parent: jnp.ndarray,  # [S, K] int32
    frozen: jnp.ndarray,  # [S] bool
    pos: jnp.ndarray,  # [S] int32
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both caches permuted by beam parents with the fresh column installed.

    Semantics identical to two ``reorder_append`` calls; one kernel moves
    both caches so the row gather cost is paid once per (slot, beam)."""
    L, S, K, H, T, d = k_cache.shape
    parent_eff = jnp.where(
        frozen[:, None], jnp.arange(K, dtype=jnp.int32)[None, :],
        cont_parent.astype(jnp.int32),
    )
    # Blocks carry as many layers as fit a generous VMEM budget: big DMAs
    # pipeline (one-layer blocks measured 103 GB/s vs 273+ for full-L), and
    # the Mosaic budget is raised past the conservative 16 MB default
    # (v5e has 128 MB VMEM; the causal-engine geometry L=8, K=64, T=128
    # needs 16.12 MB with full-L blocks and double buffering). The layer
    # chunk only drops below L for far larger caches than any engine runs.
    bytes_per_layer = H * T * d * k_cache.dtype.itemsize
    lc = L
    while lc > 1 and 12 * lc * bytes_per_layer > 48 * 1024 * 1024:
        lc = max(1, lc // 2)
    while L % lc:
        lc -= 1
    row_spec = pl.BlockSpec(
        (lc, 1, 1, H, T, d),
        lambda s, k, l, parent, pos: (l, s, parent[s, k], 0, 0, 0),
    )
    col_spec = pl.BlockSpec(
        (lc, 1, 1, H, 1, d),
        lambda s, k, l, parent, pos: (l, s, parent[s, k], 0, 0, 0),
    )
    out_spec = pl.BlockSpec(
        (lc, 1, 1, H, T, d), lambda s, k, l, parent, pos: (l, s, k, 0, 0, 0)
    )
    shape = jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype)
    return pl.pallas_call(
        _reorder_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S, K, L // lc),
            in_specs=[row_spec, row_spec, col_spec, col_spec],
            out_specs=[out_spec, out_spec],
        ),
        out_shape=[shape, shape],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(parent_eff, pos.astype(jnp.int32), k_cache, v_cache, k_col, v_col)
