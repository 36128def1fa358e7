"""Wall-clock decode of a 7B-class decoder-only engine on ONE v5e chip.

The AOT footprint check proves the fit (bf16 is rejected at compile —
"Used 19.85G of 15.75G hbm" — while weight-only int8 compiles at
9.42 + 4.31 GB; see BASELINE.md). This tool measures the int8 engine's
decode step on the real chip and, at a smaller geometry where both fit,
the int8-vs-bf16 speedup — the weight stream bounds a small-beam decode
step, so the roofline predicts ~2x (role of vLLM's quantization options,
`/root/reference/prover/proof_search.py:332-366`).

Weights are initialized DIRECTLY quantized on device, one stacked weight
per dispatch via ``lax.map`` (the fp32 layer temp lives only inside the
jit), so the 13.5 GB bf16 tree never materializes.

Run (real TPU, nothing else on the chip):
    python benchmarks/causal7b_serve.py                 # 7B int8
    python benchmarks/causal7b_serve.py --geometry 1p5b --compare-bf16
    python benchmarks/causal7b_serve.py --geometry 13b --bits 4
    # 13B on ONE chip: int4 (AOT: args 11.46 + temps 3.52 GB; int8 needs
    # TP=2 and bf16 is 25.4 GB of weights alone)
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
_ap.add_argument("--geometry", choices=("7b", "1p5b", "13b"), default="7b")
_ap.add_argument("--bits", type=int, choices=(8, 4), default=8,
                 help="weight-only quantization width (4 = w4a16 packed "
                 "nibbles + per-group scales; the 13B-on-one-chip mode)")
_ap.add_argument("--compare-bf16", action="store_true",
                 help="also time the bf16 engine (must fit: 1p5b only)")
_ap.add_argument("--slots", type=int, default=4)
_ap.add_argument("--beams", type=int, default=8)
_ap.add_argument("--src", type=int, default=512)
_ap.add_argument("--dec", type=int, default=129)
_ap.add_argument("--iters", type=int, default=32)
_ap.add_argument("--reps", type=int, default=3)
_ap.add_argument("--fill", type=int, default=64)
_ap.add_argument("--reorder-mode",
                 choices=("auto", "einsum", "gather", "scan"),
                 default="auto",
                 help="scan = layer-blocked in-place reorder: halves the "
                 "loop-carried cache HBM peak (the 13B int4 one-chip fit)")
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])


def _fence(x) -> None:
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def log(**kw) -> None:
    print(json.dumps(kw), flush=True)


def make_cfg(name: str, dtype):
    from reprover_tpu.models.causal_lm import CausalLMConfig

    if name == "7b":  # LLaMA-7B geometry (MHA)
        return CausalLMConfig(
            vocab_size=32000, d_model=4096, num_layers=32, num_heads=32,
            num_kv_heads=32, d_ff=11008, compute_dtype=dtype,
        )
    if name == "13b":  # LLaMA-13B geometry (MHA) — one chip only at int4
        return CausalLMConfig(
            vocab_size=32000, d_model=5120, num_layers=40, num_heads=40,
            num_kv_heads=40, d_ff=13824, compute_dtype=dtype,
        )
    return CausalLMConfig(  # ~1.3B: both int8 and bf16 fit for the ratio
        vocab_size=32000, d_model=2048, num_layers=24, num_heads=16,
        num_kv_heads=16, d_ff=5504, compute_dtype=dtype,
    )


def init_quantized_params(cfg, bits: int = 8):
    """init_params ∘ quantize_causal_params without the bf16/fp32 peak:
    each stacked weight is built in ONE jitted lax.map whose fp32
    per-layer temp never escapes; only int8/packed-int4 (+ scale) lands
    in HBM."""
    from reprover_tpu.models.quantize import quantize_weight, quantize_weight4

    qfn = quantize_weight if bits == 8 else quantize_weight4

    def dense(key, i, o):
        return (i ** -0.5) * jax.random.normal(key, (i, o), jnp.float32)

    @partial(jax.jit, static_argnums=(1, 2))
    def stacked_q(layer_keys, i, o):
        return jax.lax.map(lambda k: qfn(dense(k, i, o)), layer_keys)

    rng = jax.random.PRNGKey(0)
    k_emb, k_layers, k_head = jax.random.split(rng, 3)
    hd = cfg.num_heads * cfg.head_dim
    shapes = {
        "q": (cfg.d_model, hd),
        "k": (cfg.d_model, cfg.kv_dim),
        "v": (cfg.d_model, cfg.kv_dim),
        "o": (hd, cfg.d_model),
        "gate": (cfg.d_model, cfg.d_ff),
        "up": (cfg.d_model, cfg.d_ff),
        "down": (cfg.d_ff, cfg.d_model),
    }
    # per-name keys: fold_in(layer) ∘ fold_in(name index) — distinct streams
    layers = {}
    for idx, (name, (i, o)) in enumerate(sorted(shapes.items())):
        keys = jnp.stack([
            jax.random.fold_in(jax.random.fold_in(k_layers, li), idx)
            for li in range(cfg.num_layers)
        ])
        layers[name] = stacked_q(keys, i, o)
        _fence(layers[name])  # keep at most one build in flight
    ones = jnp.ones((cfg.num_layers, cfg.d_model), jnp.float32)
    layers["input_norm"] = ones
    layers["post_norm"] = ones

    @jax.jit
    def emb_and_head(ke, kh):
        e = jax.random.normal(ke, (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02
        h = qfn(dense(kh, cfg.d_model, cfg.vocab_size))
        return e.astype(jnp.bfloat16), h

    emb, head = emb_and_head(k_emb, k_head)
    return {
        "embedding": emb,
        "layers": layers,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "lm_head": head,
    }


def weight_stream_bytes(params) -> int:
    """Bytes of model weights a single decode step reads from HBM."""
    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params)
        if leaf.ndim >= 2  # norms are negligible; embedding row-gather ~0
    ) - params["embedding"].size * params["embedding"].dtype.itemsize


def time_step(cfg, params, tag: str) -> None:
    import dataclasses

    from reprover_tpu.generation.causal_engine import (
        CausalStepwiseEngine,
        causal_engine_step,
    )

    S, K = _ARGS.slots, _ARGS.beams
    eng = CausalStepwiseEngine(
        params, cfg, num_slots=S, num_beams=K,
        max_src_len=_ARGS.src, max_decode_len=_ARGS.dec,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, (S, _ARGS.src)).astype(np.int32)
    mask = np.ones((S, _ARGS.src), np.int32)
    t0 = time.perf_counter()
    eng.admit_batch_tokens(list(range(S)), ids, mask)
    _fence(eng.state.n)
    admit_s = time.perf_counter() - t0
    state = dataclasses.replace(
        eng.state,
        n=jnp.full((S,), _ARGS.fill, jnp.int32),
        done=jnp.zeros((S,), bool),
    )
    # round 4: the production reorder defaults to the one-hot einsum
    # (measured 2x the Pallas gather at engine shapes — BASELINE.md);
    # --reorder-mode scan keeps the fori_loop carry single-copy, which is
    # what lets the 13B int4 program fit one 16 GB chip at runtime.
    reorder_mode = _ARGS.reorder_mode
    del eng  # the donated carry below invalidates the engine's state refs

    # params MUST be an argument, not a closure: jit would capture the
    # 6.9 GB int8 tree as lowering constants (doubling weight HBM). The
    # state carry (3.2 GB of caches at 7B geometry) MUST be donated or the
    # un-donated input+output copies push the program past 16 GB.
    @partial(jax.jit, donate_argnums=(1,))
    def looped(p, st):
        return jax.lax.fori_loop(
            0,
            _ARGS.iters,
            lambda _, s: dataclasses.replace(
                causal_engine_step(cfg=cfg, params=p, state=s,
                                   length_penalty=0.0,
                                   reorder_mode=reorder_mode),
                # pin the fill level so every iteration times the same shape
                n=s.n,
                done=jnp.zeros_like(s.done),
            ),
            st,
        )

    # Donation consumes the carry; chain it (the fill level is pinned
    # inside the loop body, so the timed shape is identical every rep).
    t0 = time.perf_counter()
    state = looped(params, state)
    _fence(state.n)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(_ARGS.reps):
        t0 = time.perf_counter()
        state = looped(params, state)
        _fence(state.n)
        best = min(best, (time.perf_counter() - t0) * 1e3 / _ARGS.iters)
    wbytes = weight_stream_bytes(params)
    log(
        tag=tag,
        geometry=_ARGS.geometry,
        slots=S,
        beams=K,
        fill=_ARGS.fill,
        ms_per_step=round(best, 3),
        tokens_per_s=round(S * K * 1e3 / best, 1),
        admit_s=round(admit_s, 2),
        compile_s=round(compile_s, 1),
        weight_stream_gb=round(wbytes / 1e9, 2),
        # v5e HBM ~819 GB/s: fraction of the step explained by weights
        weight_bw_util=round(wbytes / 1e9 / 819.0 / (best / 1e3), 3),
    )


def main() -> None:
    from reprover_tpu.models import causal_lm  # noqa: F401 (import check)

    assert jax.devices()[0].platform == "tpu", "real-TPU benchmark"
    cfg = make_cfg(_ARGS.geometry, jnp.bfloat16)
    qparams = init_quantized_params(cfg, bits=_ARGS.bits)
    time_step(cfg, qparams, tag=f"int{_ARGS.bits}")
    if _ARGS.compare_bf16:
        assert _ARGS.geometry != "7b", "bf16 7B does not fit one chip"
        del qparams
        from reprover_tpu.models.causal_lm import init_params

        bparams = jax.jit(
            lambda k: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x,
                init_params(k, cfg),
            )
        )(jax.random.PRNGKey(0))
        time_step(cfg, bparams, tag="bf16")


if __name__ == "__main__":
    main()
