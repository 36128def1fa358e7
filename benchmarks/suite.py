"""Extended TPU benchmark suite (beyond the driver's single-line bench.py).

Measures, on the real chip:
1. corpus-embedding throughput (premises/sec) at seq 1024 bf16;
2. masked cosine top-k query QPS over a synthetic 130k-premise corpus
   (reference scale), exact ``lax.top_k`` vs ``lax.approx_max_k``;
3. retrieval train-step throughput at the reference config (bs 8, seq 1024,
   3 negatives => 5 encoder passes/step, `retrieval/model.py:155-168`);
4. generation train-step throughput (bs 8, in 1024 / out 256).

Results are printed as JSON lines and recorded in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])


def report(name, value, unit):
    print(json.dumps({"metric": name, "value": round(value, 3), "unit": unit}), flush=True)


def bench_embed(params, cfg):
    from reprover_tpu.models.t5 import encode
    from reprover_tpu.ops import masked_mean_normalize

    B, L = 128, 1024
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    @jax.jit
    def embed(params, ids, mask):
        return masked_mean_normalize(encode(params, cfg, ids, mask), mask)

    sync(embed(params, ids, mask))
    t0 = time.perf_counter()
    for _ in range(4):
        out = embed(params, ids, mask)
    sync(out)
    dt = (time.perf_counter() - t0) / 4
    report("embed_throughput_seq1024_bs128", B / dt, "premises/sec")


def bench_query():
    from reprover_tpu.ops import cosine_topk

    N, D, B, K = 131072, 1472, 64, 100
    rng = np.random.default_rng(0)
    prem = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    prem = prem / jnp.linalg.norm(prem, axis=1, keepdims=True)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    mask = jnp.asarray(rng.random((B, N)) > 0.5)

    for approx in (False, True):
        v, i = cosine_topk(q, prem, mask, K, approximate=approx)
        sync(v)
        t0 = time.perf_counter()
        for _ in range(8):
            v, i = cosine_topk(q, prem, mask, K, approximate=approx)
        sync(v)
        dt = (time.perf_counter() - t0) / 8
        tag = "approx" if approx else "exact"
        report(f"query_topk100_{tag}_qps_131k_corpus", B / dt, "queries/sec")


def bench_train(params, cfg):
    import dataclasses

    # Activation checkpointing is mandatory at this batch size on a 16GB
    # v5e (without it the step needs ~60GB of saved activations).
    cfg = dataclasses.replace(cfg, remat=True)
    from reprover_tpu.training import (
        generation_loss,
        init_train_state,
        make_optimizer,
        make_train_step,
        retrieval_loss,
    )

    rng = np.random.default_rng(0)
    tx = make_optimizer(1e-4, 2000)

    # retrieval: bs 8, 3 negatives, seq 1024 (reference config)
    B, L, n = 8, 1024, 3
    batch = {
        "context_ids": jnp.asarray(rng.integers(3, cfg.vocab_size, (B, L)), jnp.int32),
        "context_mask": jnp.ones((B, L), jnp.int32),
        "premise_ids": jnp.asarray(
            rng.integers(3, cfg.vocab_size, (B * (1 + n), L)), jnp.int32
        ),
        "premise_mask": jnp.ones((B * (1 + n), L), jnp.int32),
        "label": jnp.zeros((B, B * (1 + n)), jnp.float32),
    }
    # The train step donates its state; keep a fresh copy per task.
    state = init_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_train_step(retrieval_loss, cfg, tx)
    state, loss = step(state, batch)
    sync(loss)
    t0 = time.perf_counter()
    for _ in range(4):
        state, loss = step(state, batch)
    sync(loss)
    dt = (time.perf_counter() - t0) / 4
    report("retrieval_train_step_bs8_seq1024_3neg", 1.0 / dt, "steps/sec")
    report("retrieval_train_examples_per_sec", B / dt, "examples/sec")
    del state

    # generation: bs 8, in 1024 / out 256
    B, LI, LO = 8, 1024, 256
    gbatch = {
        "state_ids": jnp.asarray(rng.integers(3, cfg.vocab_size, (B, LI)), jnp.int32),
        "state_mask": jnp.ones((B, LI), jnp.int32),
        "tactic_ids": jnp.asarray(rng.integers(3, cfg.vocab_size, (B, LO)), jnp.int32),
    }
    state = init_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_train_step(generation_loss, cfg, tx)
    state, loss = step(state, gbatch)
    sync(loss)
    t0 = time.perf_counter()
    for _ in range(4):
        state, loss = step(state, gbatch)
    sync(loss)
    dt = (time.perf_counter() - t0) / 4
    report("generation_train_step_bs8_in1024_out256", 1.0 / dt, "steps/sec")


def main():
    from reprover_tpu.models.t5 import byt5_small, init_params

    cfg = byt5_small(compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    bench_query()
    bench_embed(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), params), cfg
    )
    bench_train(params, cfg)


if __name__ == "__main__":
    main()
