"""Headline benchmark: ByT5-small corpus-embedding throughput (premises/sec).

This is the reference's re-indexing hot loop (`retrieval/index.py:33-40`,
`retrieval/model.py:183-210`): embed every premise with the ByT5-small
encoder + masked mean-pool + L2 normalize, at the reference's max_seq_len
of 1024 bytes (worst-case bucket; real indexing also uses shorter buckets).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md). We anchor
against an analytic estimate of the reference stack (HF torch ByT5-small on
1x A100 80GB): ~0.46 TFLOP per 1024-byte premise through the 12-layer
encoder, at ~30% MFU of 312 bf16 TFLOP/s => ~200 premises/sec.
"""

import json

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_PREMISES_PER_SEC = 200.0
SEQ_LEN = 1024


def _die(reason: str) -> None:
    print(
        json.dumps(
            {
                "metric": "embed_throughput",
                "value": 0.0,
                "unit": "premises/sec",
                "vs_baseline": 0.0,
                "error": reason,
            }
        ),
        flush=True,
    )
    sys.exit(1)


def _init_devices_or_die():
    """First device touch, guarded. With the axon relay down, the TPU
    plugin's backend init retries forever inside native code (CLAUDE.md —
    not even SIGALRM can interrupt it), so probe BEFORE initializing and
    fail loudly instead of hanging the driver's bench run. Two layers:
    a fast TCP check of the relay endpoint, then a SUBPROCESS init probe
    with a hard timeout — the 2026-08-19 outage showed the local tunnel
    endpoint can keep accepting TCP while the relay behind it is dead,
    which only the real `jax.devices()` attempt detects."""
    import os
    import socket
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "axon":
        host = os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")[0]
        try:
            socket.create_connection((host, 8083), timeout=10).close()
        except OSError as e:
            _die(
                f"TPU relay {host}:8083 unreachable ({e}); "
                "device init would hang forever"
            )
        try:
            r = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax; d = jax.devices(); "
                    "raise SystemExit(0 if d and d[0].platform == 'tpu' else 3)",
                ],
                timeout=240,
            )
            if r.returncode != 0:
                _die(
                    f"device-init probe exited {r.returncode}; "
                    "tunnel present but no TPU behind it"
                )
        except subprocess.TimeoutExpired:
            _die(
                "device-init probe hung >240s: relay endpoint accepts TCP "
                "but the relay is dead (init spins forever in native code)"
            )
    return jax.devices()


def main() -> None:
    from reprover_tpu.models.t5 import (
        byt5_small,
        encode,
        fuse_mlp_params,
        init_params,
    )
    from reprover_tpu.ops import masked_mean_normalize

    on_tpu = _init_devices_or_die()[0].platform == "tpu"
    cfg = byt5_small(
        compute_dtype=jnp.bfloat16, flash_encoder=on_tpu, unroll_encoder=on_tpu
    )
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    # Store weights in bf16 so HBM reads are not 2x inflated by fp32 casts.
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def embed(params, ids, mask):
        return masked_mean_normalize(encode(params, cfg, ids, mask), mask)

    @jax.jit
    def embed_scanned(params, ids, mask):
        # The real indexing pipeline shape: many batches resident on device,
        # one dispatch. Amortizes per-call host/tunnel latency that the
        # per-batch path pays 4x per measurement.
        def body(_, io):
            i, m = io
            return None, masked_mean_normalize(encode(params, cfg, i, m), m)

        _, out = jax.lax.scan(body, None, (ids, mask))
        return out

    def sync(x):
        # block_until_ready is a no-op through the axon tunnel; a tiny host
        # fetch is the reliable fence.
        return np.asarray(x[:1, :1])

    rng = np.random.default_rng(0)
    best = 0.0
    for batch in (64, 128):
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (batch, SEQ_LEN)), jnp.int32)
        mask = jnp.ones((batch, SEQ_LEN), jnp.int32)
        sync(embed(params, ids, mask))  # compile + warm
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            out = embed(params, ids, mask)
        sync(out)
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)

    # Scanned megabatch: 8 chunks of 64 per dispatch.
    chunks, batch = 8, 64
    ids = jnp.asarray(
        rng.integers(3, cfg.vocab_size, (chunks, batch, SEQ_LEN)), jnp.int32
    )
    mask = jnp.ones((chunks, batch, SEQ_LEN), jnp.int32)
    sync(embed_scanned(params, ids, mask)[0])  # compile + warm
    t0 = time.perf_counter()
    out = embed_scanned(params, ids, mask)
    sync(out[0])
    dt = time.perf_counter() - t0
    best = max(best, chunks * batch / dt)

    print(
        json.dumps(
            {
                "metric": "byt5_small_embed_throughput_seq1024",
                "value": round(best, 2),
                "unit": "premises/sec",
                "vs_baseline": round(best / A100_REFERENCE_PREMISES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
