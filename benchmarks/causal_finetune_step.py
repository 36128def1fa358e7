"""Decoder-only fine-tuning step: naive vs flash attention.

The in-framework LLaMA-family fine-tune (`causal_lm_loss` — the
reference's LLaMA-Factory role, `/root/reference/generation/preprocess.py`)
ran its teacher-forced attention through a naive path materializing
[B, H, T, T] scores + a causal-bias tensor per layer under remat-free
autodiff. ``cfg.flash_attention`` routes it through the Pallas scaled
causal kernel (fwd + custom-VJP bwd). This driver times one optimizer
step both ways at the benched causal geometry.

Run on the real TPU:
    python benchmarks/causal_finetune_step.py [--batch 8] [--seq 2048]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=8)
_ap.add_argument("--seq", type=int, default=2048)
_ap.add_argument("--steps", type=int, default=8)
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

V5E_PEAK_TFLOPS = 197.0


def fence(x: jax.Array) -> None:
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def bench(flash: bool) -> dict:
    import optax

    from reprover_tpu.models import causal_lm
    from reprover_tpu.training import make_optimizer

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = causal_lm.CausalLMConfig(
        vocab_size=4096, d_model=1024, num_layers=8, num_heads=16,
        num_kv_heads=8, d_ff=2816,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        flash_attention=flash,
    )
    params = causal_lm.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-4, 10)
    opt_state = tx.init(params)

    B, T = _ARGS.batch, _ARGS.seq
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.asarray(ids)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return causal_lm.causal_lm_loss(p, cfg, ids, mask, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state)
    fence(loss)
    t_compile = time.time() - t0

    t0 = time.time()
    for _ in range(_ARGS.steps):
        params, opt_state, loss = step(params, opt_state)
    fence(loss)
    dt = (time.time() - t0) / _ARGS.steps

    # 6ND fwd+bwd matmul convention + attention term.
    n_params = sum(x.size for x in jax.tree.leaves(params))
    flops = 6 * n_params * B * T + 3 * 4 * B * cfg.num_heads * T * T * cfg.head_dim
    return {
        "flash": flash,
        "steps_per_s": round(1.0 / dt, 3),
        "ms_per_step": round(dt * 1e3, 1),
        "compile_s": round(t_compile, 1),
        "mfu_pct": round(flops / dt / (V5E_PEAK_TFLOPS * 1e12) * 100, 1),
        "loss": round(float(loss), 4),
    }


def main() -> None:
    for flash in (False, True):
        # Naive at T=2048 saves ~17 GB of [B, H, T, T] activations for the
        # backward and OOMs on a 16 GB v5e — report it rather than crash:
        # flash enabling the shape IS the result.
        try:
            print(json.dumps(bench(flash)), flush=True)
        except Exception as e:
            print(
                json.dumps({
                    "flash": flash,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }),
                flush=True,
            )


if __name__ == "__main__":
    main()
