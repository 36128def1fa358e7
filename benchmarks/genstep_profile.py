"""Attribution profile of the generation train step (MFU 26->? push).

At the true reference config (bs 8, inp 2304, out 512, remat) the flagship
train step runs ~2.0 steps/s (~28% MFU). This tool splits the step into
fwd-only loss / fwd+bwd / full optimizer step, and the model into
encoder-only vs full, so the gap decomposes into:

- bwd:fwd ratio (ideal ~2.0 with saved intermediates, ~3.0 with full
  remat; higher means the backward kernels or recompute are the sink),
- optimizer overhead (param+moment streaming),
- encoder vs decoder share (the decoder's cross-attention reads the
  [B,2304] encoder states per layer).

Run on the real TPU: python benchmarks/genstep_profile.py [--policy lite]
"""

from __future__ import annotations

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
_ap.add_argument("--policy", default="lite", choices=["full", "lite", "offload"])
_ap.add_argument("--reps", type=int, default=4)
_ap.add_argument("--batch", type=int, default=8)
_ap.add_argument(
    "--flash-block-q", type=int, default=0,
    help="force the flash-encoder q-block (0 = heuristic; 256/384/768 "
    "divide L=2304 and AOT-compile — see aot_compile_check.py)",
)
_ap.add_argument(
    "--flash-block-kv", type=int, default=0,
    help="route the flash encoder through the KV-blocked kernel at this "
    "KV block (keeps block_q at 512 where the full-row heuristic drops "
    "to 128, e.g. L=2304)",
)
_ap.add_argument("--inp", type=int, default=2304,
                 help="encoder input length (8192 = the long-context step)")
_ap.add_argument("--out", type=int, default=512)
_ap.add_argument(
    "--step-only", action="store_true",
    help="time only the donated full train step (the attribution passes "
    "lack donation and can OOM at long context where the step fits)",
)
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

V5E_PEAK_TFLOPS = 197.0


def fence(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def timed(f, *args) -> float:
    out = f(*args)
    fence(out)
    best = float("inf")
    for _ in range(_ARGS.reps):
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def main() -> None:
    from reprover_tpu.models import init_params
    from reprover_tpu.models.t5 import byt5_small, encode, fuse_mlp_params
    from reprover_tpu.training import (
        generation_loss,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = byt5_small(
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        remat=True,
        remat_policy=_ARGS.policy,
        flash_encoder=on_tpu,
        flash_decoder=on_tpu,
        flash_block_q=_ARGS.flash_block_q,
        flash_block_kv=_ARGS.flash_block_kv,
    )
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B, Lg, T = _ARGS.batch, _ARGS.inp, _ARGS.out
    labels = np.asarray(rng.integers(3, 259, (B, T)), np.int32)
    labels[:, -8:] = -100
    batch = {
        "state_ids": jnp.asarray(rng.integers(3, 259, (B, Lg)), jnp.int32),
        "state_mask": jnp.ones((B, Lg), jnp.int32),
        "tactic_ids": jnp.asarray(labels),
    }

    res: dict = {
        "policy": _ARGS.policy,
        "batch": B,
        "flash_block_q": _ARGS.flash_block_q,
    }

    if not _ARGS.step_only:
        # fwd-only loss
        fwd = jax.jit(lambda p, b: generation_loss(p, cfg, b))
        res["fwd_ms"] = round(timed(fwd, params, batch), 1)

        # fwd+bwd (no optimizer)
        fwdbwd = jax.jit(
            lambda p, b: jax.value_and_grad(
                lambda pp: generation_loss(pp, cfg, b)
            )(p)
        )
        res["fwdbwd_ms"] = round(timed(fwdbwd, params, batch), 1)
        res["bwd_fwd_ratio"] = round(
            (res["fwdbwd_ms"] - res["fwd_ms"]) / res["fwd_ms"], 2
        )

        # encoder-only fwd and fwd+bwd (grad wrt params through sum readout)
        enc_fwd = jax.jit(
            lambda p, i, m: jnp.sum(
                encode(p, cfg, i, m).astype(jnp.float32) ** 2
            )
        )
        res["enc_fwd_ms"] = round(
            timed(enc_fwd, params, batch["state_ids"], batch["state_mask"]), 1
        )
        enc_bwd = jax.jit(
            lambda p, i, m: jax.grad(
                lambda pp: jnp.sum(
                    encode(pp, cfg, i, m).astype(jnp.float32) ** 2
                )
            )(p)
        )
        res["enc_fwdbwd_ms"] = round(
            timed(enc_bwd, params, batch["state_ids"], batch["state_mask"]), 1
        )
        res["decoder_share_ms"] = round(
            res["fwdbwd_ms"] - res["enc_fwdbwd_ms"], 1
        )

    # full step LAST: the donated train state consumes the param buffers
    tx = make_optimizer(1e-4, 10)
    state = init_train_state(params, tx)
    step = make_train_step(generation_loss, cfg, tx)
    s2, loss = step(state, batch)
    fence(loss)
    best = float("inf")
    for _ in range(_ARGS.reps):
        t0 = time.perf_counter()
        s2, loss = step(s2, batch)
        fence(loss)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    res["step_ms"] = round(best, 1)
    if not _ARGS.step_only:
        res["optimizer_ms"] = round(res["step_ms"] - res["fwdbwd_ms"], 1)

    # MFU at the measured full step
    D, I, F, H, d = cfg.d_model, cfg.inner_dim, cfg.d_ff, cfg.num_heads, cfg.d_kv
    enc_dense = cfg.num_encoder_layers * Lg * 2 * (4 * D * I + 3 * D * F)
    enc_attn = cfg.num_encoder_layers * 4 * H * Lg * Lg * d
    dec_dense = cfg.num_decoder_layers * T * 2 * (8 * D * I + 3 * D * F)
    dec_attn = cfg.num_decoder_layers * (4 * H * T * T * d + 4 * H * T * Lg * d)
    lm_head = T * 2 * D * cfg.vocab_size
    fwd_flops = (enc_dense + enc_attn + dec_dense + dec_attn + lm_head) * B
    res["fwd_tflops"] = round(fwd_flops / 1e12, 2)
    res["step_mfu_pct"] = round(
        100 * 3 * fwd_flops / (res["step_ms"] / 1e3) / (V5E_PEAK_TFLOPS * 1e12),
        1,
    )
    res["steps_per_sec"] = round(1e3 / res["step_ms"], 3)
    res["inp"], res["out"] = Lg, T
    res["flash_block_kv"] = _ARGS.flash_block_kv
    res["tokens_per_sec"] = round(B * (Lg + T) * 1e3 / res["step_ms"], 1)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
