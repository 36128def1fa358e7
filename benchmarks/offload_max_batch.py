"""Max trainable retrieval batch size: on-device vs host-offloaded Adam.

byt5-small geometry, seq 1024, 3 negatives, remat — the reference training
config (`/root/reference/retrieval/confs/cli_lean4_random.yaml`) on a 16GB
v5e. The offload flag streams the Adam moments through pinned_host
(`common.py:387-393` DeepSpeedCPUAdam role), freeing ~2x params of HBM.
Prints one JSON line per (mode, batch) attempt.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from reprover_tpu.models import init_params
from reprover_tpu.models.t5 import byt5_small, fuse_mlp_params
from reprover_tpu.training import (
    init_train_state,
    make_optimizer,
    make_train_step,
    offload_opt_state,
    retrieval_loss,
)


def fence(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def try_batch(b, offload, steps=4, remat_policy="full"):
    rng = np.random.default_rng(0)
    L = 1024
    batch = {
        "context_ids": jnp.asarray(rng.integers(3, 259, (b, L)), jnp.int32),
        "context_mask": jnp.ones((b, L), jnp.int32),
        "premise_ids": jnp.asarray(rng.integers(3, 259, (b * 4, L)), jnp.int32),
        "premise_mask": jnp.ones((b * 4, L), jnp.int32),
        "label": jnp.zeros((b, b * 4), jnp.float32),
    }
    cfg = byt5_small(
        compute_dtype=jnp.bfloat16, remat=True, flash_encoder=True,
        remat_policy=remat_policy,
    )
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    tx = make_optimizer(1e-4, 10)
    state = init_train_state(params, tx)
    if offload:
        state = offload_opt_state(state)
    step = make_train_step(retrieval_loss, cfg, tx, offload_opt=offload)
    state, loss = step(state, batch)
    fence(loss)
    t0 = time.time()
    for _ in range(steps):
        state, loss = step(state, batch)
    fence(loss)
    return (time.time() - t0) / steps


def main():
    import sys

    # --policies adds the remat-policy axis: "full" recomputes, "lite"
    # saves fat intermediates in HBM (fastest, most memory), "offload"
    # streams them to pinned host (the reference cpu_checkpointing role:
    # full-remat memory at lite-like recompute savings, if host DMA keeps up).
    policies = (
        ("full", "lite", "offload") if "--policies" in sys.argv else ("full",)
    )
    for policy in policies:
        for offload in (False, True):
            for b in (8, 16, 24, 32, 48):
                tag = {
                    "mode": "offload" if offload else "device",
                    "remat_policy": policy,
                    "batch": b,
                }
                try:
                    dt = try_batch(b, offload, remat_policy=policy)
                    print(
                        json.dumps(
                            {
                                **tag,
                                "sec_per_step": round(dt, 3),
                                "examples_per_sec": round(b / dt, 2),
                                "ok": True,
                            }
                        ),
                        flush=True,
                    )
                except Exception as ex:
                    print(
                        json.dumps(
                            {**tag, "ok": False, "error": repr(ex)[:200]}
                        ),
                        flush=True,
                    )
                    break  # bigger batches will also OOM


if __name__ == "__main__":
    main()
