"""On-chip gradient parity: flash vs naive retrieval train step at byt5
geometry (bug isolation for the flagship fine-tune flatline).

CPU interpret-mode parity already passes (fwd exact, grads at toy shapes);
this checks the REAL Mosaic-compiled kernels at the exact production
config (byt5-small, remat lite, bs 8, seq 1024) — the one path only the
flagship exercises. Compares loss values and the gradient cosine/norm per
leaf between flash and naive attention, same batch, same params.

Run on the TPU: python benchmarks/probe_flash_grad_tpu.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from reprover_tpu.models.t5 import byt5_small, init_params
from reprover_tpu.training import retrieval_loss


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    cfg_flash = byt5_small(
        compute_dtype=dt, remat=True, remat_policy="lite",
        flash_encoder=True, flash_decoder=True,
    )
    cfg_naive = dataclasses.replace(
        cfg_flash, flash_encoder=False, flash_decoder=False
    )
    params = init_params(jax.random.PRNGKey(0), cfg_flash)

    rng = np.random.default_rng(0)
    B, L, NP = 4, 1024, 16  # halved batch: the probe holds two grad sets undonated
    batch = {
        "context_ids": jnp.asarray(rng.integers(3, 200, (B, L)), jnp.int32),
        "context_mask": jnp.asarray(
            (np.arange(L)[None] < rng.integers(200, L, (B, 1))), jnp.int32
        ),
        "premise_ids": jnp.asarray(rng.integers(3, 200, (NP, L)), jnp.int32),
        "premise_mask": jnp.asarray(
            (np.arange(L)[None] < rng.integers(40, 300, (NP, 1))), jnp.int32
        ),
        "label": jnp.asarray(
            (rng.random((B, NP)) < 0.1).astype(np.float32)
        ),
    }

    def run(cfg, tag):
        def loss_fn(p):
            return retrieval_loss(p, cfg, batch)

        val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        val = float(np.asarray(val))
        flat = {}
        for kp, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
            flat["/".join(map(str, kp))] = np.asarray(g, np.float64).ravel()
            g.delete()  # free HBM before the second config's run
        print(f"{tag}: loss={val:.6f}")
        return val, flat

    v_f, g_f = run(cfg_flash, "flash")
    v_n, g_n = run(cfg_naive, "naive")
    print(f"loss diff: {abs(v_f - v_n):.3e}")
    worst = 1.0
    for k in g_f:
        a, b = g_f[k], g_n[k]
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-12 and nb < 1e-12:
            continue  # leaf untouched by the loss on both sides (decoder)
        cos = float(a @ b / (na * nb)) if na > 0 and nb > 0 else float("nan")
        ratio = float(na / nb) if nb > 0 else float("inf")
        tag = "MISMATCH" if (not (0.98 < cos <= 1.0001)
                             or not (0.9 < ratio < 1.1)) else "ok"
        print(f"  {tag} {k}: cos={cos:.5f} norm_ratio={ratio:.4f} "
              f"|flash|={na:.3e} |naive|={nb:.3e}")
        worst = min(worst, cos if cos == cos else -1)
    print(f"worst grad cosine across leaves: {worst:.5f}")
    print("VERDICT:", "PARITY" if worst > 0.98 and abs(v_f - v_n) < 3e-3
          else "DIVERGENT — flash train path differs at byt5 geometry")


if __name__ == "__main__":
    main()
