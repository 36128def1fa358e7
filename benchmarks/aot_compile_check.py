"""Chipless AOT compile-check of every TPU-only program against v5e.

The CPU test suite proves *semantics* (interpret-mode Pallas, virtual
meshes) but cannot catch Mosaic/XLA-TPU compile failures — e.g. the
round-3 scoped-VMEM OOM in the reorder-gather kernel at the causal-engine
geometry, which crashed serving on the real chip while every CPU test
passed. libtpu ships in the image, and
``jax.experimental.topologies.get_topology_desc`` builds a chipless v5e
compile target from it — so the exact Mosaic pipeline the hardware uses
runs offline, no tunnel required.

Checks (shapes = the production geometries from BASELINE.md):
- flash encoder attention fwd+bwd at the embed (B=64, L=1024) and
  generation-training (B=8, L=2304) shapes;
- causal + cross decoder attention fwd+bwd at the training shape;
- the reorder-append gather kernel at both engines' cache geometries;
- the full stepwise-engine step programs (decode + advance + gather
  reorder) for the T5 and causal families;
- the headline embed program (flash encode + masked-mean pooling).

Param/state structures come from ``jax.eval_shape`` — nothing is
materialized. Exit code != 0 on any failure; one line per check.

Run: ``python benchmarks/aot_compile_check.py``  (kernels ~2-4 min; the
two full engine-step programs are large graphs and can take tens of
minutes on a 1-core host — filter with ``--only engine`` /
``--only kernel`` to split the run).
"""

from __future__ import annotations

import functools
import os as _os
import sys as _sys

_os.environ["JAX_PLATFORMS"] = ""  # bypass the axon default; no device used
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax

# The default backend must be CPU, not the axon plugin: module imports and
# eval_shape tracing touch the default backend, and with the tunnel down the
# plugin retries forever (observed as an infinite nanosleep loop). The env
# var alone does not stop the plugin from registering — force it here (the
# CLAUDE.md-documented workaround). The chipless v5e compile target from
# get_topology_desc is independent of the default backend.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

FAILURES: list = []
_ONLY: str = ""


def _target():
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x2x1"
    )
    mesh = Mesh(np.array([topo.devices[0]]), ("x",))
    return NamedSharding(mesh, PartitionSpec())


def check(
    name: str,
    fn,
    *args,
    donate: tuple = (),
    expect_oom: bool = False,
    arg_shardings: tuple = None,
) -> None:
    """AOT-compile ``fn`` for one v5e core; args are ShapeDtypeStructs.

    Already-jit'd callables (e.g. the train step from
    ``make_train_step``, which carries ``donate_argnums``) are lowered
    directly so donation survives — the reported buffer-assignment sizes
    are only meaningful with the real donation set. Note the chipless
    target REPORTS sizes (printed per check) but does not enforce the
    16 GB HBM limit — on the real chip the compile helper rejects
    over-budget programs at compile time; compare args+temps here against
    16 GB to predict that."""
    if _ONLY and _ONLY not in name:
        return
    if arg_shardings is None:
        rep = _REP
        args = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep), args
        )
    else:
        # multi-device (TP) compile: one sharding tree per argument;
        # memory_analysis then reports the PER-CHIP program.
        args = tuple(
            jax.tree.map(
                lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
                arg, shs,
            )
            for arg, shs in zip(args, arg_shardings)
        )
    try:
        jitted = (
            fn if hasattr(fn, "lower") else jax.jit(fn, donate_argnums=donate)
        )
        compiled = jitted.lower(*args).compile()
        mem = ""
        try:
            ma = compiled.memory_analysis()
            gb = 1024 ** 3
            mem = (
                f"  [HBM: args {ma.argument_size_in_bytes / gb:.2f} GB"
                f" + temps {ma.temp_size_in_bytes / gb:.2f} GB"
                f" + out {ma.output_size_in_bytes / gb:.2f} GB]"
            )
        except Exception:  # memory analysis is best-effort
            pass
        if expect_oom:
            FAILURES.append(name)
            print(
                f"{name}: UNEXPECTED FIT (expected compile-time HBM OOM){mem}",
                flush=True,
            )
        else:
            print(f"{name}: COMPILE OK{mem}", flush=True)
    except Exception as e:  # report every failure, keep checking
        msg = str(e)
        if expect_oom and "RESOURCE_EXHAUSTED" in msg:
            # Negative control: the program is SUPPOSED to exceed HBM
            # (e.g. the bf16 7B engine step the int8 variant fixes).
            # Note: arguments-dominated programs ARE enforced by the
            # chipless target, unlike temp-dominated ones.
            print(f"{name}: EXPECTED HBM OOM: {msg.splitlines()[0][:200]}", flush=True)
            return
        FAILURES.append(name)
        print(f"{name}: FAIL {type(e).__name__}: {msg[:400]}", flush=True)


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def main() -> None:
    global _REP, _ONLY
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only",
        default="",
        help="substring filter on check names (e.g. 'engine', 'attn')",
    )
    _ONLY = ap.parse_args().only
    _REP = _target()
    bf = jnp.bfloat16

    # ---- attention kernels ---------------------------------------- #
    from reprover_tpu.ops.flash_attention import (
        causal_flash_attention,
        cross_flash_attention,
        encoder_flash_attention,
    )

    H, d = 6, 64  # byt5-small geometry
    enc = functools.partial(encoder_flash_attention, num_heads=H)
    for B, L, tag in ((64, 1024, "embed"), (8, 2304, "train")):
        x = sds((B, L, H * d), bf)
        check(
            f"enc_attn_fwd_{tag}", enc, x, x, x,
            sds((B, L), jnp.int32), sds((32, H), jnp.float32),
        )

    # Tuning probes: forced q-blocks at the generation-training length
    # (2304), where the VMEM heuristic picks 128. 512 does not divide 2304;
    # the 128-multiples that do are 256 / 384 / 768. A probe that compiles
    # here is safe to sweep on hardware via
    # ``flash_kernel_bisect.py --sweep-block-q``.
    for bq in (256, 384, 768):
        x = sds((8, 2304, H * d), bf)
        check(
            f"enc_attn_fwd_train_bq{bq}",
            functools.partial(enc, block_q=bq, force_block_q=True),
            x, x, x, sds((8, 2304), jnp.int32), sds((32, H), jnp.float32),
        )

    # Long-context: any L > 4096 auto-routes to the KV-blocked online-
    # softmax kernel (O(N) VMEM — the full-row design cannot compile at
    # these lengths; blockwise is bounded by HBM only).
    for B, L in ((8, 8192), (2, 16384)):
        x = sds((B, L, H * d), bf)
        check(
            f"enc_attn_fwd_blockwise_{L}", enc, x, x, x,
            sds((B, L), jnp.int32), sds((32, H), jnp.float32),
        )

    def enc_grad(q, k, v, mask, rel):
        f = lambda q, k, v, rel: jnp.sum(
            encoder_flash_attention(
                q, k, v, mask, rel, num_heads=H
            ).astype(jnp.float32)
            ** 2
        )
        return jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, rel)

    for B, L, tag in ((8, 1024, "retrieval"), (8, 2304, "train")):
        x = sds((B, L, H * d), bf)
        check(
            f"enc_attn_bwd_{tag}", enc_grad, x, x, x,
            sds((B, L), jnp.int32), sds((32, H), jnp.float32),
        )

    # Backward tuning probes (force_block_q applies to fwd AND bwd kernels;
    # the bwd budget picks 128 at L=2304 — ~7 live fp32 [BQ, L] tiles, so
    # 256 ≈ 16.5 MB and 384 ≈ 24.8 MB of live temporaries: Mosaic decides).
    def enc_grad_forced(bq):
        def fn(q, k, v, mask, rel):
            f = lambda q, k, v, rel: jnp.sum(
                encoder_flash_attention(
                    q, k, v, mask, rel, num_heads=H,
                    block_q=bq, force_block_q=True,
                ).astype(jnp.float32)
                ** 2
            )
            return jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, rel)

        return fn

    for bq in (256, 384):
        x = sds((8, 2304, H * d), bf)
        check(
            f"enc_attn_bwd_train_bq{bq}", enc_grad_forced(bq), x, x, x,
            sds((8, 2304), jnp.int32), sds((32, H), jnp.float32),
        )

    # Long-context backward: L > 4096 auto-routes to the blockwise bwd
    # (LSE-recompute + blockwise dq/d_bias + dk/dv kernels).
    x = sds((2, 8192, H * d), bf)
    check(
        "enc_attn_bwd_blockwise_8192", enc_grad, x, x, x,
        sds((2, 8192), jnp.int32), sds((32, H), jnp.float32),
    )

    # Scaled causal kernel (LLaMA-family fine-tuning path,
    # cfg.flash_attention) at the benched causal geometry, fwd + bwd.
    from reprover_tpu.ops.flash_attention import scaled_causal_flash_attention

    def scaled_grad(q, k, v, mask):
        f = lambda q, k, v: jnp.sum(
            scaled_causal_flash_attention(
                q, k, v, mask, num_heads=16, scale=0.125
            ).astype(jnp.float32)
            ** 2
        )
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    x = sds((8, 2048, 16 * 64), bf)
    check(
        "scaled_causal_fwd_finetune",
        functools.partial(
            scaled_causal_flash_attention, num_heads=16, scale=0.125
        ),
        x, x, x, sds((8, 2048), jnp.int32),
    )
    check(
        "scaled_causal_bwd_finetune", scaled_grad, x, x, x,
        sds((8, 2048), jnp.int32),
    )

    # Long-context fine-tuning: T > 4096 auto-routes to the causal
    # blockwise kernels (all-future blocks skipped, O(N) VMEM).
    x = sds((2, 8192, 16 * 64), bf)
    check(
        "scaled_causal_fwd_blockwise_8192",
        functools.partial(
            scaled_causal_flash_attention, num_heads=16, scale=0.125
        ),
        x, x, x, sds((2, 8192), jnp.int32),
    )
    check(
        "scaled_causal_bwd_blockwise_8192", scaled_grad, x, x, x,
        sds((2, 8192), jnp.int32),
    )

    def caus_grad(q, k, v, rel):
        f = lambda q, k, v, rel: jnp.sum(
            causal_flash_attention(q, k, v, rel, num_heads=H).astype(
                jnp.float32
            )
            ** 2
        )
        return jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, rel)

    x = sds((8, 512, H * d), bf)
    check(
        "causal_attn_fwd_train",
        functools.partial(causal_flash_attention, num_heads=H),
        x, x, x, sds((32, H), jnp.float32),
    )
    check("causal_attn_bwd_train", caus_grad, x, x, x, sds((32, H), jnp.float32))

    def cross_grad(q, k, v, mask):
        f = lambda q, k, v: jnp.sum(
            cross_flash_attention(q, k, v, mask, num_heads=H).astype(
                jnp.float32
            )
            ** 2
        )
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    q = sds((8, 512, H * d), bf)
    kv = sds((8, 2304, H * d), bf)
    check(
        "cross_attn_fwd_train",
        functools.partial(cross_flash_attention, num_heads=H),
        q, kv, kv, sds((8, 2304), jnp.int32),
    )
    check("cross_attn_bwd_train", cross_grad, q, kv, kv, sds((8, 2304), jnp.int32))

    # Long-input cross: S > 4096 auto-routes to the blockwise path (the
    # raised-input-cap generation shape: 8k encoder states, 512 decode).
    q = sds((4, 512, H * d), bf)
    kv = sds((4, 8192, H * d), bf)
    check(
        "cross_attn_fwd_blockwise_8192",
        functools.partial(cross_flash_attention, num_heads=H),
        q, kv, kv, sds((4, 8192), jnp.int32),
    )
    check(
        "cross_attn_bwd_blockwise_8192", cross_grad, q, kv, kv,
        sds((4, 8192), jnp.int32),
    )

    # ---- reorder-append gather at both engines' cache geometries --- #
    from reprover_tpu.ops.beam_reorder import reorder_append_gather

    # T = 129 for the causal family: serving allocates decode 128 + 1 for
    # the start token (service_load.py) — exactly the geometry whose
    # scoped-VMEM OOM (17.12M > 16M) crashed serving before the
    # layer-split fix; keep probing it, not a rounded-down 128.
    for ld, hh, T, tag in ((8, 8, 129, "causal"), (4, 6, 128, "t5")):
        cache = sds((ld, 8, 64, hh, T, 64), bf)
        col = sds((ld, 8, 64, hh, 1, 64), bf)
        check(
            f"reorder_gather_{tag}", reorder_append_gather,
            cache, cache, col, col,
            sds((8, 64), jnp.int32), sds((8,), jnp.bool_), sds((8,), jnp.int32),
        )

    # ---- full engine step programs (serving hot path) -------------- #
    from reprover_tpu.generation.causal_engine import (
        causal_engine_step,
        init_causal_engine_state,
    )
    from reprover_tpu.generation.engine import engine_step, init_engine_state
    from reprover_tpu.models import causal_lm
    from reprover_tpu.models.t5 import byt5_small, encode, init_params

    cfg = byt5_small(compute_dtype=bf, flash_encoder=True, unroll_encoder=True)
    params = jax.eval_shape(
        lambda: jax.tree.map(
            lambda x: x.astype(bf), init_params(jax.random.PRNGKey(0), cfg)
        )
    )
    state = jax.eval_shape(
        lambda: init_engine_state(None, cfg, 8, 64, 512, 128)
    )
    # State donated like the production engine jit — without it the
    # footprint counts a dead input copy of every KV cache.
    # Production path (round 4): one-hot einsum reorder everywhere.
    check(
        "t5_engine_step",
        lambda p, s: engine_step(p, cfg, s, 0.0),
        params, state, donate=(1,),
    )
    # The Pallas gather-reorder kernel stays available
    # (reorder_mode="gather") — keep its Mosaic compile covered at the
    # engine shape.
    check(
        "t5_engine_step_gather_kernel",
        lambda p, s: engine_step(p, cfg, s, 0.0, reorder_mode="gather"),
        params, state, donate=(1,),
    )

    ccfg = causal_lm.CausalLMConfig(
        vocab_size=4096, d_model=1024, num_layers=8, num_heads=16,
        num_kv_heads=8, d_ff=2816, compute_dtype=bf,
    )
    cparams = jax.eval_shape(
        lambda: jax.tree.map(
            lambda x: x.astype(bf),
            causal_lm.init_params(jax.random.PRNGKey(0), ccfg),
        )
    )
    cstate = jax.eval_shape(lambda: init_causal_engine_state(ccfg, 8, 64, 512, 129))
    check(
        "causal_engine_step",
        lambda p, s: causal_engine_step(p, ccfg, s, 0.0),
        cparams, cstate, donate=(1,),
    )

    # ---- 7B-class decoder served from ONE 16 GB chip via int8 ------ #
    # LLaMA-7B geometry (32 x 4096 x 11008, 32k vocab). bf16 weights are
    # 13.5 GB — with the engine caches the step cannot fit one v5e chip;
    # weight-only int8 (QuantWeight leaves, Pallas w8a16 kernel for the
    # big matmuls) halves the weight stream and fits with room to spare.
    # FORCE_KERNEL=True: this trace runs on the CPU backend for a TPU
    # target, so the backend-based auto-routing must be overridden to
    # compile the production TPU program.
    from reprover_tpu.models import quantize as _qz
    from reprover_tpu.models.quantize import quantize_causal_params

    b7 = causal_lm.CausalLMConfig(
        vocab_size=32000, d_model=4096, num_layers=32, num_heads=32,
        num_kv_heads=32, d_ff=11008, compute_dtype=bf,
    )
    p7 = jax.eval_shape(
        lambda: jax.tree.map(
            lambda x: x.astype(bf),
            causal_lm.init_params(jax.random.PRNGKey(0), b7),
        )
    )
    q7 = jax.eval_shape(quantize_causal_params, p7)
    s7 = jax.eval_shape(lambda: init_causal_engine_state(b7, 4, 8, 512, 129))
    _qz.FORCE_KERNEL = True
    try:
        check(
            "causal7b_int8_engine_step",
            lambda p, s: causal_engine_step(p, b7, s, 0.0),
            q7, s7, donate=(1,),
        )
        # The admission program at a FULL wave (A = num_slots) hits the
        # w8a16 kernel at its largest M — prefill rows A*(max_src_len-1)
        # = 4*511 = 2044. This is the program that exposed the kernel's
        # full-M x-tile scoped-VMEM OOM on the real chip (fixed by the
        # M-blocked grid in ops/quant_matmul.py); keep it covered.
        from reprover_tpu.generation.causal_engine import causal_admit_program

        check(
            "causal7b_int8_admit_wave",
            lambda p, s, sl, i, m: causal_admit_program(
                p, b7, 4, 8, s, sl, i, m
            ),
            q7, s7, sds((4,), jnp.int32),
            sds((4, 512), jnp.int32), sds((4, 512), jnp.int32),
            donate=(1,),
        )
    finally:
        _qz.FORCE_KERNEL = None
    # bf16 negative control at the same geometry: measured chipless
    # rejection "Used 19.85G of 15.75G hbm" (arguments 15.56 GB — weights
    # 13.5 GB + caches; argument-dominated programs ARE enforced by the
    # chipless target). int8 compiles at args 9.42 + temps 4.31 GB.
    check(
        "causal7b_bf16_engine_step",
        lambda p, s: causal_engine_step(p, b7, s, 0.0),
        p7, s7, donate=(1,), expect_oom=True,
    )

    # ---- 13B-class decoder on TP=2 via int8 x tensor parallel ------ #
    # Chipless MULTI-device compile: a 2-device mesh over topology
    # devices, int8 params sharded with the quant-aware Megatron specs
    # (kernel_ok=False — the engine's TP mode), KV caches over their
    # head axis, einsum reorder (the engine's mesh gate). Per-chip
    # weights: 12.7 GB bf16 / 2 chips would still be 6.4 GB — int8 TP=2
    # brings the whole step comfortably under one chip's 16 GB.
    import dataclasses as _dc

    from jax.experimental import topologies as _tps
    from jax.sharding import Mesh as _Mesh, NamedSharding as _NS, PartitionSpec as _P

    from reprover_tpu.generation.causal_engine import CausalEngineState
    from reprover_tpu.parallel.sharding import causal_param_partition_specs

    topo2 = _tps.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
    mesh2 = _Mesh(np.array(topo2.devices[:2]).reshape(1, 2), ("data", "model"))
    b13 = causal_lm.CausalLMConfig(
        vocab_size=32000, d_model=5120, num_layers=40, num_heads=40,
        num_kv_heads=40, d_ff=13824, compute_dtype=bf,
    )
    p13 = jax.eval_shape(
        lambda: jax.tree.map(
            lambda x: x.astype(bf),
            causal_lm.init_params(jax.random.PRNGKey(0), b13),
        )
    )
    q13 = jax.eval_shape(
        functools.partial(quantize_causal_params, kernel_ok=False), p13
    )
    s13 = jax.eval_shape(lambda: init_causal_engine_state(b13, 4, 8, 512, 129))
    pshard = jax.tree.map(
        lambda sp: _NS(mesh2, sp),
        causal_param_partition_specs(q13, model_parallel=True),
    )
    # mirror of CausalStepwiseEngine._state_shardings on mesh2
    pkv = _NS(mesh2, _P(None, None, "model", None, None))
    dkv = _NS(mesh2, _P(None, None, None, "model", None, None))
    rep2 = _NS(mesh2, _P())
    sshard = CausalEngineState(**{
        **{f.name: rep2 for f in _dc.fields(CausalEngineState)},
        "prompt_k": pkv, "prompt_v": pkv, "dec_k": dkv, "dec_v": dkv,
    })
    check(
        "causal13b_int8_tp2_engine_step",
        lambda p, s: causal_engine_step(p, b13, s, 0.0, reorder_mode="einsum"),
        q13, s13, donate=(1,), arg_shardings=(pshard, sshard),
    )

    # ---- 13B-class decoder on ONE chip via int4 -------------------- #
    # Same geometry, single device, packed-int4 weights (Quant4Weight:
    # two nibbles per byte along K, per-128-group scales, Pallas w4a16
    # kernel for the big decode matmuls). Weights drop 25.4 GB bf16 ->
    # ~6.4 GB packed + ~0.4 GB scales — the TP=2 requirement above
    # becomes a one-chip deployment. FORCE_KERNEL=True for the same
    # chipless-trace reason as the 7B int8 block.
    q13_4 = jax.eval_shape(
        functools.partial(quantize_causal_params, bits=4), p13
    )
    _qz.FORCE_KERNEL = True
    try:
        check(
            "causal13b_int4_engine_step",
            lambda p, s: causal_engine_step(p, b13, s, 0.0),
            q13_4, s13, donate=(1,),
        )
        # The single-step program above under-reports the SERVING-LOOP
        # footprint: a fori_loop carry must double-buffer any cache that
        # a whole-array permutation rewrites, and the real chip rejected
        # the einsum-reorder loop at 17.44G (two extra 1.57 GB
        # while-carry cache copies, 2026-08-19). reorder_mode="scan"
        # rewrites each layer in place (dynamic_update_slice is aliased
        # through the carry), so the loop-carried program must fit; this
        # gate holds the one-chip 13B serving claim at the *loop* level.
        import jax.lax as _lax

        def _int4_loop(p, s):
            return _lax.fori_loop(
                0, 8,
                lambda _, st: _dc.replace(
                    causal_engine_step(
                        p, b13, st, 0.0, reorder_mode="scan"
                    ),
                    n=st.n, done=st.done,
                ),
                s,
            )

        check(
            "causal13b_int4_serve_loop_scan",
            _int4_loop, q13_4, s13, donate=(1,),
        )
        # Prompt admission is part of the one-chip claim too. At
        # prefill M = 4*511 = 2044 the activation exceeds the kernel's
        # VMEM residency cap, so admission takes the XLA dequant path —
        # this gate bounds the f32 dequant temporaries it materializes.
        check(
            "causal13b_int4_admit_wave",
            lambda p, s, sl, i, m: causal_admit_program(
                p, b13, 4, 8, s, sl, i, m
            ),
            q13_4, s13, sds((4,), jnp.int32),
            sds((4, 512), jnp.int32), sds((4, 512), jnp.int32),
            donate=(1,),
        )
    finally:
        _qz.FORCE_KERNEL = None

    # ---- 13B int4 x TP=2: the freed HBM buys slot geometry --------- #
    # Composition tier past both rows above (round-5: VERDICT #4):
    # packed int4 sharded over the 2-device mesh with the quant-aware
    # Megatron specs (Quant4Weight: nibbles and per-K-group scales share
    # the weight's spec, so row splits shard K/2 and K/g in lockstep;
    # kernel routing off under GSPMD). ~3.2 GB packed weights per chip
    # frees ~7 GB vs the one-chip int4 row — spent here on DOUBLE the
    # slots (8 x 8 beams), i.e. twice the concurrent search requests per
    # deployment. Gate at the serving-loop level (scan reorder, aliased
    # carry) like the one-chip row.
    s13_8 = jax.eval_shape(lambda: init_causal_engine_state(b13, 8, 8, 512, 129))
    q13_4tp = jax.eval_shape(
        functools.partial(quantize_causal_params, kernel_ok=False, bits=4),
        p13,
    )
    pshard4 = jax.tree.map(
        lambda sp: _NS(mesh2, sp),
        causal_param_partition_specs(q13_4tp, model_parallel=True),
    )
    sshard8 = CausalEngineState(**{
        **{f.name: rep2 for f in _dc.fields(CausalEngineState)},
        "prompt_k": pkv, "prompt_v": pkv, "dec_k": dkv, "dec_v": dkv,
    })

    def _int4_tp_loop(p, s):
        return _lax.fori_loop(
            0, 8,
            lambda _, st: _dc.replace(
                causal_engine_step(p, b13, st, 0.0, reorder_mode="scan"),
                n=st.n, done=st.done,
            ),
            s,
        )

    check(
        "causal13b_int4_tp2_serve_loop_scan",
        _int4_tp_loop, q13_4tp, s13_8, donate=(1,),
        arg_shardings=(pshard4, sshard8),
    )

    # ---- full training-step programs (reference configs) ----------- #
    # Compiled with the real donation set, so XLA's buffer assignment
    # reports the true HBM footprint (printed per check); compare
    # args+temps against 16 GB to predict the real chip's compile-time
    # OOM rejection — the chipless target itself does not enforce it.
    from reprover_tpu.models.t5 import fuse_mlp_params
    from reprover_tpu.training import (
        generation_loss,
        init_train_state,
        make_optimizer,
        make_train_step,
        retrieval_loss,
    )

    tcfg = byt5_small(
        compute_dtype=bf, remat=True, remat_policy="lite",
        flash_encoder=True, flash_decoder=True,
    )
    tx = make_optimizer(1e-4, 10)
    tstate = jax.eval_shape(
        lambda: init_train_state(
            fuse_mlp_params(init_params(jax.random.PRNGKey(0), tcfg)), tx
        )
    )
    B, Lr, Lg, T = 8, 1024, 2304, 512
    rbatch = {
        "context_ids": sds((B, Lr), jnp.int32),
        "context_mask": sds((B, Lr), jnp.int32),
        "premise_ids": sds((B * 4, Lr), jnp.int32),
        "premise_mask": sds((B * 4, Lr), jnp.int32),
        "label": sds((B, B * 4), jnp.float32),
    }
    check(
        "retrieval_train_step",
        make_train_step(retrieval_loss, tcfg, tx),
        tstate, rbatch,
    )
    gbatch = {
        "state_ids": sds((B, Lg), jnp.int32),
        "state_mask": sds((B, Lg), jnp.int32),
        "tactic_ids": sds((B, T), jnp.int32),
    }
    check(
        "gen_train_step",
        make_train_step(generation_loss, tcfg, tx),
        tstate, gbatch,
    )

    # Long-input generation training (blockwise encoder + blockwise cross
    # engage at L=8192): the footprint report answers "can one chip train
    # the reference recipe at 3.5x the byte cap?" offline.
    gbatch_long = {
        "state_ids": sds((4, 8192), jnp.int32),
        "state_mask": sds((4, 8192), jnp.int32),
        "tactic_ids": sds((4, T), jnp.int32),
    }
    check(
        "gen_train_step_long8k",
        make_train_step(generation_loss, tcfg, tx),
        tstate, gbatch_long,
    )

    # ---- headline embed program (bench.py hot path) ----------------- #
    from reprover_tpu.ops import masked_mean_normalize

    def embed(p, ids, mask):
        return masked_mean_normalize(encode(p, cfg, ids, mask), mask)

    check(
        "embed_bench_program", embed, params,
        sds((64, 1024), jnp.int32), sds((64, 1024), jnp.int32),
    )

    if FAILURES:
        print(f"FAILED: {FAILURES}")
        raise SystemExit(1)
    print("ALL COMPILE OK")


if __name__ == "__main__":
    main()
