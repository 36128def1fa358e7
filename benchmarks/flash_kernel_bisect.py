"""Ablation bisect of the Pallas encoder flash-attention kernel.

`benchmarks/embed_profile.py` attributes ~36% of the embed bench's wall to
the attention kernel (101.6 ms at B=64/L=1024) at 6.2% MFU — attention is
bandwidth/VPU-bound, not MXU-bound. This tool times kernel variants with
pieces removed to locate the sink:

- full        : the production kernel (scores + T5 rel bias + softmax + PV)
- nobias      : rel-bias select chain removed (mask only)
- sharedcmp   : bias select chain with the (bucket == b) compare hoisted out
                of the per-head loop (computed once, reused by all heads)
- nosoftmax   : softmax replaced by a scale (keeps matmuls + bias)
- matmulonly  : scores + PV matmuls alone

Variants are NOT numerically equivalent — this is a cost attribution tool,
not a correctness one. Run on the real TPU:
    python benchmarks/flash_kernel_bisect.py [--batch 64] [--seq 1024]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reprover_tpu.ops.flash_attention import (
    NEG_INF,
    _bias_tile,
    _bucket_map,
    _pick_block,
)

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=64)
_ap.add_argument("--seq", type=int, default=1024)
_ap.add_argument("--heads", type=int, default=6)
_ap.add_argument("--d", type=int, default=64)
_ap.add_argument("--layers", type=int, default=12)
_ap.add_argument("--reps", type=int, default=3)
_ap.add_argument(
    "--sweep-block-q",
    default="",
    help="comma list of forced production block_q values to time as extra "
    "variants (e.g. 256,512 at L=2304 where the VMEM heuristic picks 128); "
    "AOT-validate with benchmarks/aot_compile_check.py first",
)
_ap.add_argument(
    "--block-kv",
    type=int,
    default=0,
    help="also time the KV-blocked online-softmax kernel at this KV block "
    "size (production_bkN variant; auto-selected for L > 4096 anyway)",
)
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

B, L, H, D = _ARGS.batch, _ARGS.seq, _ARGS.heads, _ARGS.d
NB, MAXD = 32, 128  # byt5 relative-attention geometry


def _kernel(
    q_ref, k_ref, v_ref, mask_ref, rel_ref, out_ref, *, variant: str
) -> None:
    block_q = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    d = k_ref.shape[2] // H

    q_start = pl.program_id(1) * block_q
    mask_bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, L]
    if variant in ("full", "sharedcmp", "nosoftmax"):
        bucket = _bucket_map(q_start, block_q, kv_len, NB, MAXD)
    if variant == "sharedcmp":
        cmps = [bucket == b for b in range(NB)]

    for h in range(H):
        qh = q_ref[0, :, h * d : (h + 1) * d]
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rel_vec = rel_ref[h, 0]
        if variant in ("full", "nosoftmax"):
            scores += _bias_tile(bucket, lambda b: rel_vec[b], NB) + mask_bias
        elif variant == "sharedcmp":
            t = jnp.zeros(bucket.shape, jnp.float32)
            for b in range(NB):
                t = jnp.where(cmps[b], rel_vec[b], t)
            scores += t + mask_bias
        elif variant == "nobias":
            scores += mask_bias
        if variant == "nosoftmax" or variant == "matmulonly":
            probs = (scores * 1e-4).astype(vh.dtype)
        else:
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            probs = (p / l).astype(vh.dtype)
        out_ref[0, :, h * d : (h + 1) * d] = jnp.dot(
            probs, vh, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def build_production(force_bq: int = 0, block_kv: int = 0):
    """The real kernel (post bias-hoist), for attribution against reality —
    the ablation variants below reproduce the pre-hoist per-cell design.
    ``force_bq`` overrides the VMEM block-size heuristic (0 = default);
    ``block_kv`` selects the KV-blocked online-softmax kernel."""
    from reprover_tpu.ops.flash_attention import encoder_flash_attention

    kw: dict = {"block_q": force_bq, "force_block_q": True} if force_bq else {}
    if block_kv:
        kw = {"block_kv": block_kv}

    @jax.jit
    def layers(q, k, v, mask, rel):
        mask2 = mask[:, 0, :]  # [B, L]
        rel_nb_h = rel[:, 0, :].T  # [NB, H]

        def body(x, _):
            return (
                encoder_flash_attention(
                    x, k, v, mask2, rel_nb_h, num_heads=H,
                    num_buckets=NB, max_distance=MAXD, **kw,
                ),
                None,
            )

        out, _ = jax.lax.scan(body, q, None, length=_ARGS.layers)
        return out

    return layers


def build(variant: str):
    if variant == "production":
        return build_production()
    if variant.startswith("production_bq"):
        return build_production(force_bq=int(variant[len("production_bq"):]))
    if variant.startswith("production_bk"):
        return build_production(block_kv=int(variant[len("production_bk"):]))
    block_q = _pick_block(1024, L, 16, 8 * 1024 * 1024)
    kern = functools.partial(_kernel, variant=variant)

    def attn(q, k, v, mask, rel):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, L, H * D), q.dtype),
            grid=(B, L // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, H * D), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, H * D), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, H * D), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, L), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, 1, NB), lambda bi, qi: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, H * D),
                                   lambda bi, qi: (bi, qi, 0),
                                   memory_space=pltpu.VMEM),
        )(q, k, v, mask, rel)

    @jax.jit
    def layers(q, k, v, mask, rel):
        def body(x, _):
            return attn(x, k, v, mask, rel), None

        out, _ = jax.lax.scan(body, q, None, length=_ARGS.layers)
        return out

    return layers


def main():
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    q = jax.random.normal(rng, (B, L, H * D), dt)
    k = jax.random.normal(rng, (B, L, H * D), dt)
    v = jax.random.normal(rng, (B, L, H * D), dt)
    mask = jnp.ones((B, 1, L), jnp.int32)
    rel = jax.random.normal(rng, (H, 1, NB), jnp.float32)

    variants = [
        "production", "full", "sharedcmp", "nobias", "nosoftmax", "matmulonly"
    ]
    if _ARGS.sweep_block_q:
        variants[1:1] = [
            f"production_bq{int(s)}"
            for s in _ARGS.sweep_block_q.split(",") if s.strip()
        ]
    if _ARGS.block_kv:
        variants.insert(1, f"production_bk{_ARGS.block_kv}")
    for variant in variants:
        try:
            fn = build(variant)
            out = fn(q, k, v, mask, rel)
            np.asarray(jax.device_get(out[:1, :1, :1]))
            best = float("inf")
            for _ in range(_ARGS.reps):
                t0 = time.perf_counter()
                out = fn(q, k, v, mask, rel)
                np.asarray(jax.device_get(out[:1, :1, :1]))
                best = min(best, (time.perf_counter() - t0) * 1e3)
        except Exception as e:  # one OOMing variant must not kill the sweep
            print(json.dumps({"variant": variant,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)
            continue
        per_layer = best / _ARGS.layers
        print(json.dumps({"variant": variant,
                          "ms_12layers": round(best, 2),
                          "ms_per_layer": round(per_layer, 3)}), flush=True)


if __name__ == "__main__":
    main()
