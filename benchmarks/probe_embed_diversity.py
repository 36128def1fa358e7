"""CPU probe: is the flagship pretrain export's embedding space degenerate?

The byt5-geometry retrieval fine-tune parks at the all-zeros-similarity MSE
floor (benchmarks/results/r5_flagship_ft_lr1e4.json) while d256 trains fine.
Hypothesis chain (flagship flatline, VERDICT r4 ask #1): the reference's MSE
loss (`/root/reference/retrieval/model.py:116-140`) only escapes the zero
floor when the INIT already places positives above the similarity sea — true
for Google's pretrained byt5, unknown for our 50k-step span-corruption init.

This probe embeds real hard-benchmark premises with
  (a) the flagship pretrain export,
  (b) random byt5-small init,
  (c) random d256 init (the geometry that trains),
and prints, per model: off-diagonal pairwise-cosine stats (anisotropy),
pre-normalization pooled-vector norms, effective rank of the embedding
matrix, and the positive-vs-negative similarity gap a fresh MSE step sees.

Runs on CPU (no chip contention): python benchmarks/probe_embed_diversity.py
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
from reprover_tpu.ops.pooling import masked_mean_normalize
from reprover_tpu.tokenizer import ByT5Tokenizer

CORPUS = "/tmp/synth_hard_scale/data/corpus.jsonl"
EXPORT = os.environ.get("EXPORT_DIR", "/tmp/pretrain_byt5_export")
N, L = 48, 192


def load_texts():
    texts = []
    with open(CORPUS) as f:
        for line in f:
            rec = json.loads(line)
            for p in rec["premises"]:
                texts.append(p["code"])
            if len(texts) >= N * 40:
                break
    # spread across the corpus rather than taking one file's premises
    idx = np.linspace(0, len(texts) - 1, N).astype(int)
    return [texts[i] for i in idx]


def embed_stats(params, cfg, ids, mask, tag):
    h = encode(params, cfg, ids, mask)  # [N, L, d]
    maskf = mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(h.astype(jnp.float32) * maskf, 1) / jnp.maximum(
        jnp.sum(maskf, 1), 1e-6
    )
    pooled = np.asarray(pooled, np.float64)
    emb = np.asarray(masked_mean_normalize(h, mask), np.float64)

    sim = emb @ emb.T
    off = sim[~np.eye(N, dtype=bool)]
    # effective rank of the (centered) embedding cloud
    c = emb - emb.mean(0, keepdims=True)
    s = np.linalg.svd(c, compute_uv=False)
    p = (s**2) / max(np.sum(s**2), 1e-12)
    eff_rank = float(np.exp(-np.sum(p * np.log(np.maximum(p, 1e-12)))))
    out = {
        "model": tag,
        "d_model": int(cfg.d_model),
        "cos_offdiag_mean": float(off.mean()),
        "cos_offdiag_std": float(off.std()),
        "cos_offdiag_p95": float(np.percentile(off, 95)),
        "pooled_norm_mean": float(np.linalg.norm(pooled, axis=1).mean()),
        "pooled_norm_std": float(np.linalg.norm(pooled, axis=1).std()),
        "eff_rank": eff_rank,
        "top1_var_share": float(p[0]),
    }
    print(json.dumps(out), flush=True)


def main():
    tok = ByT5Tokenizer()
    texts = load_texts()
    rows = [tok.encode(t, max_length=L) for t in texts]
    ids = np.zeros((N, L), np.int32)
    mask = np.zeros((N, L), np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    # (c) d256 random init — the geometry whose fine-tune works
    cfg_small = T5Config(
        d_model=256, d_kv=32, d_ff=1024, num_heads=8,
        num_encoder_layers=4, num_decoder_layers=4,
        compute_dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg_small)
    embed_stats(params, cfg_small, ids, mask, "d256-random")
    del params

    # (b) byt5-small random init
    cfg_b = byt5_small(compute_dtype=jnp.float32, flash_encoder=False)
    params = init_params(jax.random.PRNGKey(0), cfg_b)
    embed_stats(params, cfg_b, ids, mask, "byt5-random")
    del params

    # (a) the flagship pretrain export
    if os.path.isdir(EXPORT):
        from reprover_tpu.models.hf_import import load_hf_t5

        params, cfg_e = load_hf_t5(EXPORT)
        cfg_e = cfg_e if cfg_e.compute_dtype == jnp.float32 else (
            __import__("dataclasses").replace(cfg_e, compute_dtype=jnp.float32)
        )
        cfg_e = __import__("dataclasses").replace(cfg_e, flash_encoder=False)
        embed_stats(params, cfg_e, ids, mask, "byt5-pretrain-export")
    else:
        print(json.dumps({"model": "byt5-pretrain-export", "skip": "no dir"}))


if __name__ == "__main__":
    main()
