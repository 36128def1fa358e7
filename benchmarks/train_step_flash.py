"""Train-step throughput: naive vs flash (custom-VJP) encoder attention.

Reference training configs (`/root/reference/retrieval/confs/cli_lean4_random.yaml`,
`generation/confs/cli_lean4_random.yaml`): retrieval bs 8 / seq 1024 /
3 negatives; generation bs 8 / inp 2300 (padded 2304) / out 512. Run on the
real TPU; prints one line per (task, attention) cell.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import numpy as np

import jax
import jax.numpy as jnp

from reprover_tpu.models import init_params
from reprover_tpu.models.t5 import byt5_small, fuse_mlp_params
from reprover_tpu.training import (
    generation_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
    retrieval_loss,
)


def fence(x):
    # Tunnel quirk: block_until_ready is a no-op; force a host fetch.
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def bench(loss_fn, cfg, batch, steps=8):
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    tx = make_optimizer(1e-4, 10)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, cfg, tx)
    t0 = time.time()
    state, loss = step(state, batch)
    fence(loss)
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        state, loss = step(state, batch)
    fence(loss)
    dt = (time.time() - t0) / steps
    return dt, t_compile


def main():
    rng = np.random.default_rng(0)
    B, L = 8, 1024
    rbatch = {
        "context_ids": jnp.asarray(rng.integers(3, 259, (B, L)), jnp.int32),
        "context_mask": jnp.ones((B, L), jnp.int32),
        "premise_ids": jnp.asarray(rng.integers(3, 259, (B * 4, L)), jnp.int32),
        "premise_mask": jnp.ones((B * 4, L), jnp.int32),
        "label": jnp.zeros((B, B * 4), jnp.float32),
    }
    Lg, T = 2304, 512
    labels = np.asarray(rng.integers(3, 259, (B, T)), np.int32)
    labels[:, -8:] = -100
    gbatch = {
        "state_ids": jnp.asarray(rng.integers(3, 259, (B, Lg)), jnp.int32),
        "state_mask": jnp.ones((B, Lg), jnp.int32),
        "tactic_ids": jnp.asarray(labels),
    }

    for task, loss_fn, batch in (
        ("retrieval", retrieval_loss, rbatch),
        ("generation", generation_loss, gbatch),
    ):
        for flash in (False, True):
            cfg = byt5_small(
                compute_dtype=jnp.bfloat16, remat=True, flash_encoder=flash
            )
            dt, tc = bench(loss_fn, cfg, batch)
            print(
                f"{task} flash={flash}: {1/dt:.3f} steps/s "
                f"({dt*1000:.0f} ms/step, compile {tc:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
