"""Generation train-step throughput: decoder attention variants.

True reference generation config (`/root/reference/generation/confs/
cli_lean4_random.yaml:38-59`): bs 8, inp 2300 (padded 2304), out 512, remat.
Cells: flash encoder only (round-2 best) vs flash encoder + flash decoder
(causal self + cross Pallas kernels, fwd+bwd). Run on the real TPU.
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
)


def fence(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def bench(cfg, batch, steps=8):
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    tx = make_optimizer(1e-4, 10)
    state = init_train_state(params, tx)
    step = make_train_step(generation_loss, cfg, tx)
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
    B, Lg, T = 8, 2304, 512
    labels = np.asarray(rng.integers(3, 259, (B, T)), np.int32)
    labels[:, -8:] = -100
    gbatch = {
        "state_ids": jnp.asarray(rng.integers(3, 259, (B, Lg)), jnp.int32),
        "state_mask": jnp.ones((B, Lg), jnp.int32),
        "tactic_ids": jnp.asarray(labels),
    }

    for name, kw in (
        ("enc-flash only", dict(flash_encoder=True)),
        ("enc+dec flash", dict(flash_encoder=True, flash_decoder=True)),
        (
            "enc+dec flash, remat lite",
            dict(flash_encoder=True, flash_decoder=True, remat_policy="lite"),
        ),
    ):
        cfg = byt5_small(compute_dtype=jnp.bfloat16, remat=True, **kw)
        dt, tc = bench(cfg, gbatch)
        print(
            f"generation {name}: {1/dt:.3f} steps/s "
            f"({dt*1000:.0f} ms/step, compile {tc:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
