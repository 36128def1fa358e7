"""Ring attention: sequence-parallel T5 encoder self-attention over ICI.

The reference handles long byte sequences by truncation only (SURVEY.md §5
"long-context / sequence parallelism: absent"); the survey names the natural
TPU scaling path: blockwise attention first (the Pallas kernel in
:mod:`reprover_tpu.ops.flash_attention`), ring-over-ICI second. This module
is that second step — beyond-parity capability for sequences that do not fit
one chip:

- q, k, v, mask are sharded over the sequence axis across the mesh's
  ``seq`` devices (``shard_map``);
- each step, every device attends its local q shard against the current k/v
  shard and accumulates with an **online softmax** (running max/denominator),
  then passes its k/v shard to the next device with ``ppermute`` — after
  ``n_devices`` steps every q has seen every k/v, with k/v transfers riding
  the ICI ring and overlapping compute;
- the T5 relative-position bias is computed per (q-shard, k/v-shard) pair
  from global positions (same log-bucket math as the Pallas kernel), so
  results match single-device attention exactly (tested on the 8-device CPU
  mesh).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e10


def _bucket_bias(
    rel_bias: jnp.ndarray,  # [num_buckets, H]
    q_pos: jnp.ndarray,  # [Lq] global positions
    k_pos: jnp.ndarray,  # [Lk] global positions
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """[1, H, Lq, Lk] fp32 T5 bidirectional bias (exact HF bucket math)."""
    rel = k_pos[None, :] - q_pos[:, None]
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
    bucket = ret + jnp.where(is_small, rp, jnp.minimum(rp_large, half - 1))
    bias = rel_bias.astype(jnp.float32)[bucket]  # [Lq, Lk, H]
    return jnp.transpose(bias, (2, 0, 1))[None]


def ring_encoder_attention(
    q: jnp.ndarray,  # [B, H, L, d] — L sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,  # [B, L] {0,1} — L sharded over `axis`
    rel_bias: jnp.ndarray,  # [num_buckets, H] fp32 (replicated)
    mesh: Mesh,
    axis: str = "seq",
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """Sequence-parallel unscaled T5 self-attention -> [B, H, L, d]."""
    n_dev = mesh.shape[axis]
    b, h, l, d = q.shape
    assert l % n_dev == 0, f"seq {l} not divisible by {axis}={n_dev}"
    shard = l // n_dev

    def local(q_s, k_s, v_s, mask_s, rel):
        # q_s/k_s/v_s: [B, H, shard, d]; mask_s: [B, shard]
        idx = jax.lax.axis_index(axis)
        q_pos = idx * shard + jnp.arange(shard)

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, step_i):
            k_cur, v_cur, mask_cur, m, lsum, acc = carry
            src = (idx - step_i) % n_dev  # owner of the current k/v shard
            k_pos = src * shard + jnp.arange(shard)

            scores = jnp.einsum(
                "bhqd,bhkd->bhqk",
                q_s,
                k_cur,
                preferred_element_type=jnp.float32,
            )
            scores = scores + _bucket_bias(
                rel, q_pos, k_pos, num_buckets, max_distance
            )
            scores = scores + jnp.where(
                mask_cur[:, None, None, :].astype(bool), 0.0, NEG_INF
            )

            # online softmax merge
            m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
            correction = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new)
            lsum = lsum * correction + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * correction + jnp.einsum(
                "bhqk,bhkd->bhqd",
                p.astype(v_cur.dtype),
                v_cur,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)

            # rotate k/v/mask around the ring (skipped result after last use)
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            mask_nxt = jax.lax.ppermute(mask_cur, axis, perm)
            return (k_nxt, v_nxt, mask_nxt, m_new, lsum, acc), None

        # Freshly-created carries must be marked device-varying for the
        # ppermute-carrying scan (shard_map's varying-manual-axes tracking).
        def varying(x):
            return jax.lax.pcast(x, (axis,), to="varying")

        init = (
            k_s,
            v_s,
            mask_s,
            varying(jnp.full((b, h, shard, 1), -jnp.inf, jnp.float32)),
            varying(jnp.zeros((b, h, shard, 1), jnp.float32)),
            varying(jnp.zeros((b, h, shard, d), jnp.float32)),
        )
        (k_f, v_f, mask_f, m, lsum, acc), _ = jax.lax.scan(
            step, init, jnp.arange(n_dev)
        )
        return (acc / lsum).astype(q_s.dtype)

    spec4 = P(None, None, axis, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec4, spec4, spec4, P(None, axis), P()),
        out_specs=spec4,
    )(q, k, v, mask, rel_bias)
