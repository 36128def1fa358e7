"""Tunnel health probe: per-dispatch latency floor through the axon relay.

Serving-window expansions/s is bounded by the per-device-stream-item
latency (program dispatch, H2D admit, D2H status fetch), which varies
day-to-day with the relay (measured ~40-100 ms healthy, ~600 ms degraded).
Run this before/alongside any serving benchmark so e/s numbers carry their
tunnel context (BASELINE.md round-4 caveat: cross-day e/s comparisons are
meaningless without it).

Prints one JSON line with medians over --iters round trips:
- fetch_4b_ms: D2H of a single f32 scalar slice (the status-poll shape)
- fetch_64kb_ms: D2H of a 128x128 f32 block (payload-carrying fetch)
- dispatch_ms: trivial jitted add dispatch + 4-byte fetch (one full
  program round trip, the engine-step shape of conversation)
"""

import json
import statistics
import sys
import time

import numpy as np


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(json.dumps({"error": f"not a TPU: {dev.platform}"}))
        sys.exit(1)

    big = jax.device_put(jnp.ones((128, 128), jnp.float32))
    f = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(f(big)[:1, :1])  # warm compile + first-touch

    def med(fn):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) * 1e3)
        return round(statistics.median(ts), 1)

    out = {
        "platform": "tpu",
        "iters": args.iters,
        "fetch_4b_ms": med(lambda: np.asarray(big[:1, :1])),
        "fetch_64kb_ms": med(lambda: np.asarray(big)),
        "dispatch_ms": med(lambda: np.asarray(f(big)[:1, :1])),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
