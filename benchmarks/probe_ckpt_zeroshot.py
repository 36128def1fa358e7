"""CPU probe: zero-shot retrieval R@k straight from a mid-run Orbax ckpt.

The salvage/diversity probes (`probe_embed_salvage.py`) need the HF export,
which the pretrain only writes at the end of its time budget. This probe
reads a *finalized intermediate step* of the live checkpoint dir instead, so
the health gate's outcome can be predicted hours early (round-5 flagship
monitoring). Target-free Orbax restore -> params subtree -> the exact
zero-shot eval from probe_embed_salvage.

Usage: CKPT_DIR=/tmp/pretrain_byt5c_ckpt [STEP=9000] \
           python benchmarks/probe_ckpt_zeroshot.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

CKPT = os.environ.get("CKPT_DIR", "/tmp/pretrain_byt5c_ckpt")
STEP = os.environ.get("STEP")


def main():
    import numpy as np

    from benchmarks.export_from_ckpt import load_ckpt_params
    from benchmarks.probe_embed_salvage import embed, load_pairs, recall
    from reprover_tpu.models.t5 import byt5_small
    from reprover_tpu.tokenizer import ByT5Tokenizer

    steps = sorted(
        int(d) for d in os.listdir(CKPT)
        if d.isdigit() and os.path.isdir(os.path.join(CKPT, d))
    )
    step = int(STEP) if STEP else steps[-1]
    assert step in steps, f"step {step} not in {steps}"

    params = load_ckpt_params(os.path.join(CKPT, str(step)))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    cfg = byt5_small(compute_dtype=jnp.float32, flash_encoder=False)
    tok = ByT5Tokenizer()
    pairs, pool, prem_code = load_pairs()
    name_to_idx = {n: i for i, n in enumerate(pool)}
    gold_idx = np.array([name_to_idx[g] for _, g in pairs])
    ctx = embed(params, cfg, [c for c, _ in pairs], tok)
    prem = embed(params, cfg, [prem_code[n] for n in pool], tok)
    tag = f"byt5-ckpt-step{step}"
    recall(ctx, prem, gold_idx, tag, center=False)
    recall(ctx, prem, gold_idx, tag, center=True)
    # eff-rank of the premise embedding cloud (collapse detector)
    x = prem - prem.mean(0, keepdims=True)
    s = np.linalg.svd(x, compute_uv=False)
    p = (s**2) / max((s**2).sum(), 1e-12)
    eff = float(np.exp(-(p * np.log(np.maximum(p, 1e-12))).sum()))
    print(json.dumps({"model": tag, "premise_eff_rank": eff}), flush=True)


if __name__ == "__main__":
    main()
