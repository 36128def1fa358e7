"""Sequence pooling for the premise retriever.

Reference semantics (`/root/reference/retrieval/model.py:107-114`): masked
mean over real tokens, then L2-normalization to unit norm (cosine similarity
becomes a plain inner product). Computed in fp32 regardless of the encoder's
activation dtype so embeddings are stable across compute-dtype settings.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean_normalize(
    hidden: jnp.ndarray,  # [B, L, D]
    mask: jnp.ndarray,  # [B, L] {0,1}
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Masked mean-pool + L2 normalize -> unit-norm embeddings [B, D] fp32."""
    h = hidden.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    summed = jnp.einsum("bld,bl->bd", h, m)
    lens = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    mean = summed / lens
    norm = jnp.maximum(jnp.linalg.norm(mean, axis=1, keepdims=True), eps)
    return mean / norm
