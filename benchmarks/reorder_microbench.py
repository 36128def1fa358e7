"""Variants of the per-beam cache reorder+append, timed at engine shapes.

Round-3 bisect put in-engine reorder+append at 14.8 ms/step (causal shape,
both caches = 1.07 GB read+write => ~72 GB/s effective) while this
microbench's standalone gather looked ~4x better — but its `gather`
variant chained only the k output (the v half was dead code XLA could
eliminate) and there was no copy baseline. Round 4 makes the comparison
honest:

- ``copy``      : jnp.roll of both caches — the pure HBM copy roofline
                  for exactly these buffers inside a fori_loop.
- ``current``   : production einsum epilogue (one-hot matmul, post-where).
- ``batched``   : (l,s)-batched einsum (no layout copies).
- ``gather``    : production Pallas scalar-prefetch gather, BOTH caches
                  chained through the loop carry (nothing dead).
- ``gather_deadstate`` : same, plus prompt-cache-sized dead carries riding
                  the fori_loop — measures the untouched-carry copy tax
                  the real engine step pays.
- ``gather_donated``   : same as ``gather`` but the python-level rep loop
                  donates the carries (the engine's dispatch mode).

All variants report ms per step and effective GB/s over the true moved
bytes (read+write of both caches). Run on the real TPU:
    python benchmarks/reorder_microbench.py [--T 128] [--fill 64]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

_ap = argparse.ArgumentParser()
_ap.add_argument("--iters", type=int, default=64)
_ap.add_argument("--reps", type=int, default=3)
_ap.add_argument("--L", type=int, default=8)
_ap.add_argument("--S", type=int, default=8)
_ap.add_argument("--K", type=int, default=64)
_ap.add_argument("--H", type=int, default=8)
_ap.add_argument("--T", type=int, default=128)
_ap.add_argument("--D", type=int, default=64)
_ap.add_argument("--fill", type=int, default=64,
                 help="append position (pos = fill-1), matching the bisect")
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

L, S, K, H, T, D = _ARGS.L, _ARGS.S, _ARGS.K, _ARGS.H, _ARGS.T, _ARGS.D


def fence(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def timed(step_fn, carries, rest, donate=False):
    """ms per step of carries = step_fn(carries, *rest) inside a fori_loop."""
    jit_kw = {"donate_argnums": (0,)} if donate else {}

    @functools.partial(jax.jit, **jit_kw)
    def looped(c, *r):
        return jax.lax.fori_loop(
            0, _ARGS.iters, lambda _, cc: step_fn(cc, *r), c
        )

    out = looped(carries, *rest)
    fence(out)
    best = float("inf")
    for _ in range(_ARGS.reps):
        t0 = time.perf_counter()
        out = looped(out if donate else carries, *rest)
        fence(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / _ARGS.iters)
    return best


def current_one(cache, col, P, at_pos):
    permuted = jnp.einsum("sij,lsjhtd->lsihtd", P, cache)
    colp = jnp.einsum("sij,lsjhtd->lsihtd", P, col)
    return jnp.where(at_pos, colp, permuted)


def batched_one(cache, col, P, at_pos):
    Pb = jnp.broadcast_to(P[None], (cache.shape[0],) + P.shape)
    permuted = jnp.einsum("lsij,lsjhtd->lsihtd", Pb, cache)
    colp = jnp.einsum("lsij,lsjhtd->lsihtd", Pb, col)
    return jnp.where(at_pos, colp, permuted)


def main():
    from reprover_tpu.ops.beam_reorder import reorder_append_gather

    rng = jax.random.PRNGKey(0)
    kc = jax.random.normal(rng, (L, S, K, H, T, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(9), kc.shape, jnp.bfloat16)
    col = jax.random.normal(jax.random.PRNGKey(5), (L, S, K, H, 1, D), jnp.bfloat16)
    parent = jnp.roll(jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (S, 1)), 1, axis=1)
    P = jax.nn.one_hot(parent, K, dtype=kc.dtype)
    frozen = jnp.zeros((S,), bool)
    pos = jnp.full((S,), _ARGS.fill - 1, jnp.int32)
    at_pos = (
        jnp.arange(T).reshape(1, 1, 1, 1, T, 1) == pos.reshape(1, S, 1, 1, 1, 1)
    )
    moved_gb = 2 * 2 * kc.size * 2 / 1e9  # read+write of BOTH caches, bytes

    # exactness reference (both caches)
    ref_k = np.asarray(current_one(kc, col, P, at_pos), np.float32)
    ref_v = np.asarray(current_one(vc, col, P, at_pos), np.float32)

    def report(name, ms, exact):
        print(json.dumps({
            "variant": name, "ms": round(ms, 3),
            "eff_gbps": round(moved_gb / (ms / 1e3), 1),
            "exact": exact, "T": T, "fill": _ARGS.fill,
        }), flush=True)

    # copy roofline: same buffers, same loop, pure data movement
    ms = timed(lambda c: (jnp.roll(c[0], 1, axis=4), jnp.roll(c[1], 1, axis=4)),
               (kc, vc), ())
    report("copy_roll", ms, None)

    # einsum variants (both caches, both chained)
    for name, one in (("current", current_one), ("batched", batched_one)):
        def step(c, col, P, at_pos, one=one):
            return (one(c[0], col, P, at_pos), one(c[1], col, P, at_pos))
        gk = np.asarray(step((kc, vc), col, P, at_pos)[0], np.float32)
        gv = np.asarray(step((kc, vc), col, P, at_pos)[1], np.float32)
        exact = bool((gk == ref_k).all() and (gv == ref_v).all())
        report(name, timed(step, (kc, vc), (col, P, at_pos)), exact)

    # layer-blocked in-place scan (reorder_mode="scan"): the single-copy
    # loop-carry option — grounds the AUTO_SCAN_CACHE_BYTES threshold's
    # small-cache side (at 7B+ scan already measured faster in-engine)
    from reprover_tpu.generation.engine import reorder_append_scan

    def sstep(c, col, parent, frozen, pos):
        return reorder_append_scan(c[0], c[1], col, col, parent, frozen, pos)

    sk, sv = sstep((kc, vc), col, parent, frozen, pos)
    s_exact = bool(
        (np.asarray(sk, np.float32) == ref_k).all()
        and (np.asarray(sv, np.float32) == ref_v).all()
    )
    report("scan", timed(sstep, (kc, vc), (col, parent, frozen, pos)), s_exact)
    report(
        "scan_donated",
        timed(sstep, (kc + 0, vc + 0), (col, parent, frozen, pos), donate=True),
        s_exact,
    )

    # production gather: both caches chained, nothing dead
    def gstep(c, col, parent, frozen, pos):
        return reorder_append_gather(c[0], c[1], col, col, parent, frozen, pos)

    gk, gv = gstep((kc, vc), col, parent, frozen, pos)
    exact = bool(
        (np.asarray(gk, np.float32) == ref_k).all()
        and (np.asarray(gv, np.float32) == ref_v).all()
    )
    report("gather", timed(gstep, (kc, vc), (col, parent, frozen, pos)), exact)
    report(
        "gather_donated",
        # fresh copies: donation consumes the carry buffers
        timed(gstep, (kc + 0, vc + 0), (col, parent, frozen, pos), donate=True),
        exact,
    )

    # + dead carries the size of the causal engine's prompt caches
    pk = jax.random.normal(jax.random.PRNGKey(7), (L, S, H, 511, D), jnp.bfloat16)

    def gstate(c, col, parent, frozen, pos):
        k, v = reorder_append_gather(c[0], c[1], col, col, parent, frozen, pos)
        return (k, v, c[2], c[3])

    report(
        "gather_deadstate",
        timed(gstate, (kc, vc, pk, pk), (col, parent, frozen, pos)),
        None,
    )


if __name__ == "__main__":
    main()
