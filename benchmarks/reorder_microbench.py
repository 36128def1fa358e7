"""Variants of the per-beam cache reorder+append, timed at the causal shape.

Round-3 bisect: `reorder_append` moves 2x(read+write) of both KV caches in
7.1 ms at the causal serving shape — ~300 GB/s, a third of v5e HBM peak.
The production epilogue `where(at_pos, P@new_col, P@cache)` materializes the
permuted cache and then rewrites it; two candidate fixes:

- ``pre_where``: P @ where(at_pos, new_col, cache) — identical math (the
  permutation acts on the beam axis, `where` on the length axis), but the
  `where` sits on the matmul OPERAND where XLA can fuse it into the read.
- ``dus``: per-slot dynamic_update_slice of the column into the matmul
  output — in-place if XLA aliases the dead einsum result.

Prints ms and achieved GB/s for each at [L,S,K,H,T,d] = causal benched shape.
Run on the real TPU: python benchmarks/reorder_microbench.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

_ap = argparse.ArgumentParser()
_ap.add_argument("--iters", type=int, default=64)
_ap.add_argument("--reps", type=int, default=3)
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

L, S, K, H, T, D = 8, 8, 64, 8, 128, 64  # causal benched shape


def fence(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def timed(fn, *args):
    @jax.jit
    def looped(cache, *rest):
        return jax.lax.fori_loop(
            0, _ARGS.iters, lambda _, c: fn(c, *rest), cache
        )

    out = looped(*args)
    fence(out)
    best = float("inf")
    for _ in range(_ARGS.reps):
        t0 = time.perf_counter()
        out = looped(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / _ARGS.iters)
    return best


def current(cache, col, P, at_pos):
    permuted = jnp.einsum("sij,lsjhtd->lsihtd", P, cache)
    colp = jnp.einsum("sij,lsjhtd->lsihtd", P, col)
    return jnp.where(at_pos, colp, permuted)


def pre_where(cache, col, P, at_pos):
    merged = jnp.where(at_pos, col, cache)
    return jnp.einsum("sij,lsjhtd->lsihtd", P, merged)


def batched(cache, col, P, at_pos):
    """(l,s) as true dot batch dims: no layout copies.

    The production einsum "sij,lsjhtd->lsihtd" compiles to a cache
    relayout + convolution + root copy (s must lead for the dot, l must
    lead for the output) — 3x the minimum HBM traffic. Broadcasting P over
    l makes both operands and the output share the (l,s)-major layout."""
    Pb = jnp.broadcast_to(P[None], (cache.shape[0],) + P.shape)
    permuted = jnp.einsum("lsij,lsjhtd->lsihtd", Pb, cache)
    colp = jnp.einsum("lsij,lsjhtd->lsihtd", Pb, col)
    return jnp.where(at_pos, colp, permuted)


def gather(cache, col, P, at_pos):
    """Production Pallas scalar-prefetch gather (`ops/beam_reorder.py`).

    Moves BOTH caches (k and v) per call like the engine does; reported ms
    is therefore directly comparable to 2x the single-cache variants."""
    from reprover_tpu.ops.beam_reorder import reorder_append_gather

    parent = jnp.argmax(P, axis=-1).astype(jnp.int32)
    frozen = jnp.zeros((P.shape[0],), bool)
    pos = jnp.argmax(at_pos[0, :, 0, 0, :, 0], axis=-1).astype(jnp.int32)
    k, v = reorder_append_gather(cache, cache, col, col, parent, frozen, pos)
    return k


def dus(cache, col, P, at_pos):
    permuted = jnp.einsum("sij,lsjhtd->lsihtd", P, cache)
    colp = jnp.einsum("sij,lsjhtd->lsihtd", P, col)
    pos = jnp.argmax(at_pos[0, :, 0, 0, :, 0], axis=-1)  # [S]

    def upd(c, cl, p):  # c [L,K,H,T,d], cl [L,K,H,1,d]
        return jax.lax.dynamic_update_slice(c, cl, (0, 0, 0, p, 0))

    return jax.vmap(upd, in_axes=(1, 1, 0), out_axes=1)(permuted, colp, pos)


def main():
    rng = jax.random.PRNGKey(0)
    cache = jax.random.normal(rng, (L, S, K, H, T, D), jnp.bfloat16)
    col = jax.random.normal(rng, (L, S, K, H, 1, D), jnp.bfloat16)
    parent = jnp.roll(jnp.tile(jnp.arange(K)[None], (S, 1)), 1, axis=1)
    P = jax.nn.one_hot(parent, K, dtype=cache.dtype)
    pos = jnp.full((S,), T // 2, jnp.int32)
    at_pos = (
        jnp.arange(T).reshape(1, 1, 1, 1, T, 1) == pos.reshape(1, S, 1, 1, 1, 1)
    )
    gb = cache.size * 2 / 1e9  # one read or one write of the cache

    ref = np.asarray(current(cache, col, P, at_pos), np.float32)
    for name, fn in [
        ("current", current),
        ("pre_where", pre_where),
        ("batched", batched),
        ("gather", gather),  # moves k AND v: compare vs 2x the others
        ("dus", dus),
    ]:
        got = np.asarray(fn(cache, col, P, at_pos), np.float32)
        exact = bool((got == ref).all())
        ms = timed(fn, cache, col, P, at_pos)
        print(
            json.dumps(
                {
                    "variant": name,
                    "ms": round(ms, 3),
                    "min_gbps": round(2 * gb / (ms / 1e3), 1),
                    "exact": exact,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
