"""Per-component step-time budget for the causal streaming engine.

VERDICT round-2 weak #2: decoder-only streaming serves at 1.2 e/s vs the
T5 engine's 6.4 with no published attribution. This tool bisects the
``CausalStepwiseEngine`` decode step into its public components at the
benched shape (`benchmarks/service_load.py --causal`: d_model 1024 /
8 layers / GQA 16:8 / vocab 4096, 8 slots x 64 beams, in 512 / out 128)
and prints a ms/step budget, alongside the same decomposition of the T5
``StepwiseBeamEngine`` at ITS benched shape (byt5-small) as the
geometry-matched control — so the gap separates into "model shape moves
more bytes" vs "engine machinery".

Components are timed through public seams only: each program is the
module-level function (`_causal_decode_step` / `causal_engine_step` /
`advance_beams` / `reorder_append`) wrapped in a fori_loop to amortize the
tunnel's ~40-100 ms dispatch floor (CLAUDE.md). Timings fence with a tiny
host fetch — `block_until_ready` is a no-op through the tunnel.

Run (real TPU, nothing else on the chip):
    python benchmarks/causal_engine_bisect.py [--iters 64] [--decode-fill 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--iters", type=int, default=64, help="steps per timed program")
_ap.add_argument("--reps", type=int, default=3, help="timed repetitions (min taken)")
_ap.add_argument(
    "--decode-fill",
    type=int,
    default=64,
    help="decode-cache fill level n (cols of live KV) the step is timed at",
)
_ap.add_argument("--slots", type=int, default=8)
_ap.add_argument("--beams", type=int, default=64)
_ap.add_argument("--skip-t5", action="store_true")
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

S, K = _ARGS.slots, _ARGS.beams
SRC, DEC = 512, 128
FILL = _ARGS.decode_fill


def _fence(x) -> None:
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def time_program(fn, *args, iters=None, reps=None) -> float:
    """Median wall ms of one `fn(*args)` call, amortized over a fori_loop.

    `fn` must be (carry, *rest) -> carry so iterations chain (no DCE)."""
    iters = iters or _ARGS.iters
    reps = reps or _ARGS.reps

    @jax.jit
    def looped(carry, *rest):
        return jax.lax.fori_loop(
            0, iters, lambda _, c: fn(c, *rest), carry
        )

    out = looped(*args)  # compile
    _fence(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = looped(*args)
        _fence(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def gb(nbytes: float) -> float:
    return nbytes / 1e9


# ------------------------------------------------------------------ #
# Causal engine components
# ------------------------------------------------------------------ #


def causal_budget() -> dict:
    from reprover_tpu.generation.causal_engine import (
        CausalStepwiseEngine,
        _causal_decode_step,
        causal_engine_step,
    )
    from reprover_tpu.generation.engine import advance_beams, reorder_append
    from reprover_tpu.models.causal_lm import CausalLMConfig, init_params

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = CausalLMConfig(
        vocab_size=4096, d_model=1024, num_layers=8, num_heads=16,
        num_kv_heads=8, d_ff=2816,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = CausalStepwiseEngine(
        params, cfg, num_slots=S, num_beams=K,
        max_src_len=SRC, max_decode_len=DEC,
    )

    # Admit real prompts so the timed state is the serving state (prompt
    # KV filled, beams armed), then hand-advance the fill level.
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, (S, SRC)).astype(np.int32)
    mask = np.ones((S, SRC), np.int32)
    eng.admit_batch_tokens(list(range(S)), ids, mask)
    state = eng.state
    import dataclasses

    state = dataclasses.replace(
        state,
        n=jnp.full((S,), FILL, jnp.int32),
        dec_k=jax.random.normal(
            jax.random.PRNGKey(1), state.dec_k.shape, state.dec_k.dtype
        ),
        dec_v=jax.random.normal(
            jax.random.PRNGKey(2), state.dec_v.shape, state.dec_v.dtype
        ),
        done=jnp.zeros((S,), bool),
    )

    res = {}

    # total: the production step (round 4: the engines run the one-hot
    # einsum reorder everywhere — measured 2x the Pallas gather).  params
    # rides as a jit ARGUMENT — closed-over arrays would be embedded in the
    # HLO as constants and the axon remote-compile upload rejects bodies
    # that large (HTTP 413).
    def full_step(st, prm):
        return causal_engine_step(prm, cfg, st, 0.0)

    res["step_total_ms"] = time_program(full_step, state, params)

    # forward only (logits + fresh KV columns); chain via last_token
    def fwd_only(st, prm):
        logits, k_news, v_news = _causal_decode_step(prm, cfg, st)
        return dataclasses.replace(
            st, last_token=jnp.argmax(logits, -1).astype(jnp.int32)
        )

    res["decode_fwd_ms"] = time_program(fwd_only, state, params)

    # beam advance on fixed logits
    logits0 = jax.random.normal(
        jax.random.PRNGKey(3), (S, K, cfg.vocab_size), jnp.float32
    )

    def advance_only(st):
        updates, cont_parent, frozen = advance_beams(
            st, logits0, 0.0, cfg.eos_token_id
        )
        return dataclasses.replace(st, **updates)

    res["advance_beams_ms"] = time_program(advance_only, state)

    # cache reorder+append epilogue (both caches, as the step does)
    parent = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (S, 1))
    parent = jnp.roll(parent, 1, axis=1)  # force a real permutation
    frozen0 = jnp.zeros((S,), bool)
    k_new = jax.random.normal(
        jax.random.PRNGKey(4),
        (cfg.num_layers, S, K, cfg.num_kv_heads, 1, cfg.head_dim),
        state.dec_k.dtype,
    )

    def reorder_only(st):
        pos = st.n - 1
        return dataclasses.replace(
            st,
            dec_k=reorder_append(st.dec_k, k_new, parent, frozen0, pos),
            dec_v=reorder_append(st.dec_v, k_new, parent, frozen0, pos),
        )

    res["reorder_append_ms"] = time_program(reorder_only, state)

    res["residual_ms"] = res["step_total_ms"] - (
        res["decode_fwd_ms"] + res["advance_beams_ms"] + res["reorder_append_ms"]
    )

    # analytic traffic at this shape
    cache_bytes = state.dec_k.size * state.dec_k.dtype.itemsize
    res["dec_cache_gb_each"] = round(gb(cache_bytes), 3)
    # attention reads both caches once; reorder reads+writes both
    res["step_traffic_gb_analytic"] = round(gb(cache_bytes * 2 * 3), 2)
    res["shape"] = (
        f"d{cfg.d_model}/L{cfg.num_layers}/GQA{cfg.num_heads}:"
        f"{cfg.num_kv_heads}/V{cfg.vocab_size} S{S} K{K} src{SRC} dec{DEC} "
        f"fill{FILL}"
    )
    return res


# ------------------------------------------------------------------ #
# T5 engine control
# ------------------------------------------------------------------ #


def t5_budget() -> dict:
    import dataclasses

    from reprover_tpu.generation.engine import (
        StepwiseBeamEngine,
        _engine_decode_step,
        advance_beams,
        engine_step,
        reorder_append,
    )
    from reprover_tpu.models.t5 import byt5_small, fuse_mlp_params, init_params

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = byt5_small(
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        flash_encoder=on_tpu,
        unroll_encoder=on_tpu,
    )
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    eng = StepwiseBeamEngine(
        params, cfg, num_slots=S, num_beams=K,
        max_src_len=SRC, max_decode_len=DEC,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, (S, SRC)).astype(np.int32)
    mask = np.ones((S, SRC), np.int32)
    eng.admit_batch_tokens(list(range(S)), ids, mask)
    state = dataclasses.replace(
        eng.state,
        n=jnp.full((S,), FILL, jnp.int32),
        done=jnp.zeros((S,), bool),
    )

    res = {}

    def full_step(st, prm):
        return engine_step(prm, cfg, st, 0.0)

    res["step_total_ms"] = time_program(full_step, state, params)

    def fwd_only(st, prm):
        logits, k_news, v_news = _engine_decode_step(prm, cfg, st)
        return dataclasses.replace(
            st, last_token=jnp.argmax(logits, -1).astype(jnp.int32)
        )

    res["decode_fwd_ms"] = time_program(fwd_only, state, params)

    logits0 = jax.random.normal(
        jax.random.PRNGKey(3), (S, K, cfg.vocab_size), jnp.float32
    )

    def advance_only(st):
        updates, cont_parent, frozen = advance_beams(
            st, logits0, 0.0, cfg.eos_token_id
        )
        return dataclasses.replace(st, **updates)

    res["advance_beams_ms"] = time_program(advance_only, state)

    parent = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (S, 1))
    parent = jnp.roll(parent, 1, axis=1)
    frozen0 = jnp.zeros((S,), bool)
    k_new = jax.random.normal(
        jax.random.PRNGKey(4),
        (cfg.num_decoder_layers, S, K, cfg.num_heads, 1, cfg.d_kv),
        state.self_k.dtype,
    )

    def reorder_only(st):
        pos = st.n - 1
        return dataclasses.replace(
            st,
            self_k=reorder_append(st.self_k, k_new, parent, frozen0, pos),
            self_v=reorder_append(st.self_v, k_new, parent, frozen0, pos),
        )

    res["reorder_append_ms"] = time_program(reorder_only, state)
    res["residual_ms"] = res["step_total_ms"] - (
        res["decode_fwd_ms"] + res["advance_beams_ms"] + res["reorder_append_ms"]
    )
    cache_bytes = state.self_k.size * state.self_k.dtype.itemsize
    res["dec_cache_gb_each"] = round(gb(cache_bytes), 3)
    res["step_traffic_gb_analytic"] = round(gb(cache_bytes * 2 * 3), 2)
    res["shape"] = f"byt5-small S{S} K{K} src{SRC} dec{DEC} fill{FILL}"
    return res


def main() -> None:
    out = {"causal": causal_budget()}
    if not _ARGS.skip_t5:
        out["t5_control"] = t5_budget()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
