"""Real-TPU wall-clock for the KV-blocked long-context attention kernels.

Round 3 proved the O(N)-VMEM claim at compile time only (0.00 GB HBM
temps at L=16384, `benchmarks/aot_compile_check.py`); the axon relay
outage killed the queued wall-clock runs. This measures all three kernel
forms — bidirectional encoder (T5 rel-bias), causal decoder, rectangular
cross — forward AND forward+backward at L in {8192, 16384}, and reports
achieved TFLOP/s vs the attention-chain FLOPs so BASELINE.md gets rows
with measured milliseconds (VERDICT round-3 ask #1).

Role parity: long-context headroom over the reference's truncation-only
handling (`/root/reference/generation/confs/cli_lean4_random.yaml:56-57`,
SURVEY.md §5 long-context plan).

Run on the real TPU:
    python benchmarks/longcontext_wallclock.py [--lens 8192,16384] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

_ap = argparse.ArgumentParser()
_ap.add_argument("--lens", default="8192,16384")
_ap.add_argument("--batch", type=int, default=4)
_ap.add_argument("--heads", type=int, default=6)
_ap.add_argument("--d", type=int, default=64)
_ap.add_argument("--cross-t", type=int, default=512)
_ap.add_argument("--block-kv", type=int, default=512)
_ap.add_argument("--reps", type=int, default=3)
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

V5E_PEAK_TFLOPS = 197.0
NB, MAXD = 32, 128


def fence(x) -> None:
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed_ms(fn, *args) -> float:
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(_ARGS.reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def main() -> None:
    from reprover_tpu.ops.flash_attention import (
        causal_flash_attention,
        cross_flash_attention,
        encoder_flash_attention,
    )

    assert jax.devices()[0].platform == "tpu", "real-TPU benchmark"
    B, H, D = _ARGS.batch, _ARGS.heads, _ARGS.d
    bkv = _ARGS.block_kv
    rng = jax.random.PRNGKey(0)

    for L in [int(s) for s in _ARGS.lens.split(",") if s.strip()]:
        q = 0.02 * jax.random.normal(rng, (B, L, H * D), jnp.bfloat16)
        k = 0.02 * jax.random.normal(rng, (B, L, H * D), jnp.bfloat16)
        v = 0.02 * jax.random.normal(rng, (B, L, H * D), jnp.bfloat16)
        mask = jnp.ones((B, L), jnp.int32)
        rel = 0.1 * jax.random.normal(rng, (NB, H), jnp.float32)
        Tq = _ARGS.cross_t
        qc = 0.02 * jax.random.normal(rng, (B, Tq, H * D), jnp.bfloat16)

        cases = {
            "encoder": (
                jax.jit(
                    lambda q, k, v, m, r: encoder_flash_attention(
                        q, k, v, m, r, num_heads=H, block_kv=bkv
                    )
                ),
                (q, k, v, mask, rel),
                4 * B * H * L * L * D,  # two [L,L]x[L,d] matmul chains
            ),
            "causal": (
                jax.jit(
                    lambda q, k, v, r: causal_flash_attention(
                        q, k, v, r, num_heads=H, block_kv=bkv
                    )
                ),
                (q, k, v, rel),
                2 * B * H * L * L * D,  # causal: half the score rectangle
            ),
            "cross": (
                jax.jit(
                    lambda q, k, v, m: cross_flash_attention(
                        q, k, v, m, num_heads=H, block_kv=bkv
                    )
                ),
                (qc, k, v, mask),
                4 * B * H * Tq * L * D,
            ),
        }
        for name, (fwd, args, flops) in cases.items():
            row = {"form": name, "L": L, "batch": B, "block_kv": bkv}
            try:
                t0 = time.perf_counter()
                ms = timed_ms(fwd, *args)
                row["compile_s"] = round(time.perf_counter() - t0, 1)
                row["fwd_ms"] = round(ms, 2)
                row["fwd_tflops"] = round(flops / 1e12 / (ms / 1e3), 2)
                row["fwd_mxu_frac"] = round(
                    flops / 1e12 / (ms / 1e3) / V5E_PEAK_TFLOPS, 3
                )
            except Exception as e:
                row["fwd_error"] = f"{type(e).__name__}: {str(e)[:160]}"
                print(json.dumps(row), flush=True)
                continue
            # fwd+bwd through the custom VJP (sum readout; grads wrt q,k,v)
            try:
                grad_fn = jax.jit(
                    jax.grad(
                        lambda *a: jnp.sum(fwd(*a).astype(jnp.float32)),
                        argnums=tuple(range(min(3, len(args)))),
                    )
                )
                ms2 = timed_ms(grad_fn, *args)
                # backward sweeps the score rectangle ~2.5x (lse recompute
                # + dq/dbias pass + dk/dv pass) on top of the forward
                row["fwdbwd_ms"] = round(ms2, 2)
                row["fwdbwd_tflops_nominal"] = round(
                    3.5 * flops / 1e12 / (ms2 / 1e3), 2
                )
            except Exception as e:
                row["bwd_error"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
