"""CPU probe #2: is the collapsed flagship init salvageable by centering?

probe_embed_diversity.py showed the pretrain export's pooled embeddings are
near rank-1 (eff_rank 1.22, off-diag cos 0.987). Two open questions decide
the round-5 intervention:
  1. Does the export still encode CONTENT beneath the rogue direction?
     -> zero-shot retrieval R@k over a small real (context, positive) set.
  2. Does removing the shared component (batch centering, the
     BERT-whitening trick — PAPERS.md) restore discrimination?
     -> same eval on centered-then-normalized embeddings.
Controls: random byt5 init (bag-of-bytes signal) and random d256 init.

Runs on CPU: python benchmarks/probe_embed_salvage.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from reprover_tpu.models.t5 import T5Config, byt5_small, encode, init_params
from reprover_tpu.tokenizer import ByT5Tokenizer

ROOT = "/tmp/synth_hard_scale"
EXPORT = os.environ.get("EXPORT_DIR", "/tmp/pretrain_byt5_export")
NQ, NP, L = 32, 96, 192


def load_pairs():
    """(context, gold premise names) from the val split + premise pool."""
    import random as pyrandom

    rng = pyrandom.Random(0)
    with open(f"{ROOT}/data/random/val.json") as f:
        theorems = json.load(f)
    prem_code = {}
    with open(f"{ROOT}/data/corpus.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            for p in rec["premises"]:
                prem_code[p["full_name"]] = p["code"]

    pairs = []  # (state_text, gold_name)
    for th in theorems:
        for st in th.get("traced_tactics", []):
            golds = [
                a["full_name"] for a in st.get("annotated_tactic", [{}, []])[1]
                if a.get("full_name") in prem_code
            ]
            if golds:
                pairs.append((st["state_before"], golds[0]))
    rng.shuffle(pairs)
    pairs = pairs[:NQ]
    gold_names = [g for _, g in pairs]
    pool = list(dict.fromkeys(gold_names))
    others = [n for n in prem_code if n not in set(pool)]
    rng.shuffle(others)
    pool += others[: NP - len(pool)]
    return pairs, pool, prem_code


def embed(params, cfg, texts, tok):
    rows = [tok.encode(t, max_length=L) for t in texts]
    ids = np.zeros((len(rows), L), np.int32)
    mask = np.zeros((len(rows), L), np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = 1
    h = encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    maskf = jnp.asarray(mask, jnp.float32)[..., None]
    pooled = jnp.sum(h.astype(jnp.float32) * maskf, 1) / jnp.maximum(
        jnp.sum(maskf, 1), 1e-6
    )
    return np.asarray(pooled, np.float64)


def recall(ctx, prem, gold_idx, tag, center):
    if center:
        mu = prem.mean(0, keepdims=True)  # corpus mean, the serving-time form
        ctx, prem = ctx - mu, prem - mu
    ctx = ctx / np.maximum(np.linalg.norm(ctx, axis=1, keepdims=True), 1e-9)
    prem = prem / np.maximum(np.linalg.norm(prem, axis=1, keepdims=True), 1e-9)
    sim = ctx @ prem.T
    rank = (sim > sim[np.arange(len(gold_idx)), gold_idx][:, None]).sum(1)
    out = {
        "model": tag,
        "centered": center,
        "R@1": float(np.mean(rank < 1)),
        "R@10": float(np.mean(rank < 10)),
        "pool": prem.shape[0],
        "queries": ctx.shape[0],
    }
    print(json.dumps(out), flush=True)


def main():
    tok = ByT5Tokenizer()
    pairs, pool, prem_code = load_pairs()
    name_to_idx = {n: i for i, n in enumerate(pool)}
    gold_idx = np.array([name_to_idx[g] for _, g in pairs])
    ctx_texts = [c for c, _ in pairs]
    prem_texts = [prem_code[n] for n in pool]

    def run(params, cfg, tag):
        ctx = embed(params, cfg, ctx_texts, tok)
        prem = embed(params, cfg, prem_texts, tok)
        recall(ctx, prem, gold_idx, tag, center=False)
        recall(ctx, prem, gold_idx, tag, center=True)

    cfg_small = T5Config(
        d_model=256, d_kv=32, d_ff=1024, num_heads=8,
        num_encoder_layers=4, num_decoder_layers=4,
        compute_dtype=jnp.float32,
    )
    run(init_params(jax.random.PRNGKey(0), cfg_small), cfg_small, "d256-random")

    cfg_b = byt5_small(compute_dtype=jnp.float32, flash_encoder=False)
    run(init_params(jax.random.PRNGKey(0), cfg_b), cfg_b, "byt5-random")

    if os.path.isdir(EXPORT):
        import dataclasses

        from reprover_tpu.models.hf_import import load_hf_t5

        params, cfg_e = load_hf_t5(EXPORT)
        cfg_e = dataclasses.replace(
            cfg_e, compute_dtype=jnp.float32, flash_encoder=False
        )
        run(params, cfg_e, "byt5-pretrain-export")


if __name__ == "__main__":
    main()
