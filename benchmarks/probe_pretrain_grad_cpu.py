"""CPU interpret-mode grad parity for the PRETRAIN loss at byt5 kernel shapes.

The healthy d256 pretrain never exercised flash (its d_kv 32 fails the
pretrain gate `d_kv >= 64`, reprover_tpu/training/pretrain.py), so the
flash DECODER+CROSS backward at byt5 geometry is only exonerated for the
encoder side (probe_flash_grad_tpu.py probes retrieval loss — encoder
only). This probe runs `generation_loss` (teacher-forced seq2seq: flash
encoder + causal decoder + rectangular cross) flash-vs-naive, fwd+bwd, at
the byt5 pretrain's exact KERNEL shapes — L=1024, T=256, d_kv=64, H=6 —
with shrunken d_model/layer count (tiling depends on L/T/H/d, not d_model).

Runs on CPU (interpret-mode Pallas, a few minutes):
    python benchmarks/probe_pretrain_grad_cpu.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from reprover_tpu.models.t5 import T5Config, init_params
from reprover_tpu.training.tasks import generation_loss


def main() -> None:
    cfg_flash = T5Config(
        d_model=128, d_kv=64, d_ff=256, num_heads=6,
        num_encoder_layers=1, num_decoder_layers=1,
        compute_dtype=jnp.float32,
        flash_encoder=True, flash_decoder=True,
    )
    cfg_naive = dataclasses.replace(
        cfg_flash, flash_encoder=False, flash_decoder=False
    )
    params = init_params(jax.random.PRNGKey(0), cfg_flash)

    rng = np.random.default_rng(0)
    B, L, T = 2, 1024, 256
    labels = rng.integers(3, 200, (B, T)).astype(np.int32)
    tgt_lens = rng.integers(40, T, (B, 1))
    labels = np.where(np.arange(T)[None] < tgt_lens, labels, -100)
    batch = {
        "state_ids": jnp.asarray(rng.integers(3, 200, (B, L)), jnp.int32),
        "state_mask": jnp.asarray(
            (np.arange(L)[None] < rng.integers(200, L, (B, 1))), jnp.int32
        ),
        "tactic_ids": jnp.asarray(labels, jnp.int32),
    }

    def run(cfg, tag):
        def loss_fn(p):
            return generation_loss(p, cfg, batch)

        val, grads = jax.value_and_grad(loss_fn)(params)
        val = float(np.asarray(val))
        flat = {
            "/".join(map(str, kp)): np.asarray(g, np.float64).ravel()
            for kp, g in jax.tree_util.tree_flatten_with_path(grads)[0]
        }
        print(f"{tag}: loss={val:.6f}", flush=True)
        return val, flat

    v_f, g_f = run(cfg_flash, "flash")
    v_n, g_n = run(cfg_naive, "naive")
    print(f"loss diff: {abs(v_f - v_n):.3e}")
    worst = 1.0
    for k in sorted(g_f):
        a, b = g_f[k], g_n[k]
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(a @ b / (na * nb)) if na > 0 and nb > 0 else float("nan")
        ratio = float(na / nb) if nb > 0 else float("inf")
        tag = "MISMATCH" if (not (0.98 < cos <= 1.0001)
                             or not (0.9 < ratio < 1.1)) else "ok"
        print(f"  {tag} {k}: cos={cos:.5f} ratio={ratio:.4f} |f|={na:.3e}")
        worst = min(worst, cos if cos == cos else -1)
    print(f"worst grad cosine: {worst:.5f}")
    print("VERDICT:", "PARITY" if worst > 0.98 and abs(v_f - v_n) < 3e-3
          else "MISMATCH — flash decoder/cross bwd broken at byt5 shapes")


if __name__ == "__main__":
    main()
