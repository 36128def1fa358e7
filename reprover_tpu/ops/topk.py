"""Fused masked top-k premise query.

The TPU-native replacement for the reference's query path
(`/root/reference/common.py:299-326`): instead of a full ``argsort`` over
~130k similarities followed by a host-side Python filter loop, inaccessible
entries are masked to ``-inf`` and ``lax.top_k`` runs fused with the scoring
matmul on device. Rank equivalence with filter-after-argsort holds because
masked entries can never enter the top-k and ``lax.top_k`` breaks ties by
lowest index, matching a stable descending argsort.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Plain Python float: creating a device array at import time would
# initialize the JAX backend for every consumer of the package.
NEG_INF = float("-inf")


@partial(jax.jit, static_argnames=("k",))
def masked_topk(
    scores: jnp.ndarray,  # [B, N] fp32
    mask: jnp.ndarray,  # [B, N] bool / {0,1}
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over ``scores`` restricted to ``mask`` -> (values, indices).

    Masked-out entries score ``-inf``; if fewer than ``k`` entries are
    accessible the trailing results have ``-inf`` values (callers needing the
    reference's ``ValueError`` behavior check ``values[-1] > -inf``).
    """
    masked = jnp.where(mask.astype(bool), scores, NEG_INF)
    return jax.lax.top_k(masked, k)


@partial(jax.jit, static_argnames=("k", "approximate"))
def cosine_topk(
    context_emb: jnp.ndarray,  # [B, D] unit-norm
    premise_emb: jnp.ndarray,  # [N, D] unit-norm
    mask: jnp.ndarray,  # [B, N]
    k: int,
    approximate: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused cosine-similarity masked top-k: one matmul + top-k, no host trip.

    The similarity matmul runs on the MXU in the embeddings' dtype with fp32
    accumulation; masking and top-k fuse into the same program.
    ``approximate=True`` uses ``lax.approx_max_k`` (TPU-native partial-sort,
    recall target 0.99) — faster over large corpora when exact rank parity
    with the reference's argsort is not required.
    """
    sims = jnp.einsum(
        "bd,nd->bn", context_emb, premise_emb, preferred_element_type=jnp.float32
    )
    if approximate:
        masked = jnp.where(mask.astype(bool), sims, NEG_INF)
        return jax.lax.approx_max_k(masked, k, recall_target=0.99)
    return masked_topk(sims, mask, k)
