"""Qualitative probe of the dominant Pass@1 failure bucket (generator_rank).

The round-5 attribution table (`BASELINE.md`, `r5_abl_trained_attr.json`)
puts 117/118 hard-benchmark failures in one bucket: the gold premise reaches
the prompt, but the gold tactic misses the prover's 8-beam set. This probe
answers the question the bucket count can't: is the gold tactic a *near
miss* (present at beam 12-32 — wider beams fix it) or *systematically
absent* (a formatting skew or a training deficit — beams won't help)?

For each logged `attribution_record` it rebuilds the exact search-time
prompt (retrieved premises from the run's own ``predictions.pickle`` +
``format_augmented_state`` + ``remove_marks``, matching
`reprover_tpu/prover/tactic_generator.py:190-205`), runs the SAVED
generator with a wide beam on CPU, and prints candidates vs gold.

Reference role: the per-theorem "why did search fail" analysis the
reference never built (its Pass@1 is a single scalar,
`/root/reference/prover/evaluate.py:146-162`).

Usage (CPU, no tunnel needed):
    python benchmarks/probe_failed_beams.py \
        --root /tmp/synth_hard_scale \
        --attr-json benchmarks/results/r5_abl_trained_attr.json \
        --num-beams 32 --limit 8
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any array op (CLAUDE.md)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_hard_scale")
    ap.add_argument("--attr-json", required=True,
                    help="a synthetic_reference_scale.py output with "
                    "attribution_record lines")
    ap.add_argument("--num-beams", type=int, default=32)
    ap.add_argument("--limit", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=1024)
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from reprover_tpu.data import format_augmented_state, remove_marks
    from reprover_tpu.generation.generator import TacticGeneratorModel
    from reprover_tpu.models.t5 import T5Config

    # Saved-run geometry: d256 (synthetic_reference_scale.model_cfgs), CPU
    # inference island: fp32, no flash, no unroll.
    cfg = T5Config(
        d_model=256, d_kv=32, d_ff=1024, num_heads=8,
        num_encoder_layers=4, num_decoder_layers=4,
        compute_dtype=jnp.float32, remat=False,
    )

    records = []
    for line in open(args.attr_json):
        d = json.loads(line)
        if d.get("stage") == "attribution_record":
            records.append(d)
    records = records[: args.limit]
    print(f"# {len(records)} attribution records to replay", flush=True)

    with open(f"{args.root}/data/random/val.json") as f:
        val = {t["full_name"]: t for t in json.load(f)}
    with open(f"{args.root}/predictions.pickle", "rb") as f:
        preds = pickle.load(f)
    by_key = {(r["full_name"], r["tactic_idx"]): r for r in preds}

    with open(f"{args.root}/generator_params_trained.pkl", "rb") as f:
        gen_params = jax.tree.map(jnp.asarray, pickle.load(f))
    gen = TacticGeneratorModel(
        gen_params, cfg, max_inp_seq_len=args.max_seq_len, max_oup_seq_len=64
    )

    near_miss = absent = 0
    for rec in records:
        thm = val.get(rec["name"])
        if thm is None:
            print(f"!! {rec['name']} not in val.json")
            continue
        step = rec["step"]
        tac = thm["traced_tactics"][step]
        gold = tac["tactic"]
        state = tac["state_before"]
        pr = by_key.get((rec["name"], step))
        if pr is None:
            print(f"!! no prediction record for {rec['name']} step {step}")
            continue
        prompt = remove_marks(
            format_augmented_state(
                state, pr["retrieved_premises"], args.max_seq_len
            )
        )
        cands = gen.generate([prompt], num_samples=args.num_beams)[0]
        rank = next((i for i, (t, _) in enumerate(cands) if t == gold), None)
        # longest common prefix between gold and the closest candidate —
        # separates "near miss in token space" from "different tactic
        # family entirely"
        def lcp(a: str, b: str) -> int:
            n = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                n += 1
            return n

        best_lcp, best_cand = max(
            ((lcp(gold, t), t) for t, _ in cands), key=lambda x: x[0]
        )
        if rank is not None:
            near_miss += 1
        else:
            absent += 1
        print(json.dumps({
            "name": rec["name"], "step": step,
            "gold": gold,
            "gold_rank_at_wide_beam": rank,
            "top4": [t for t, _ in cands[:4]],
            "best_lcp": best_lcp,
            "closest": best_cand,
            "prompt_head": prompt[:120],
        }, ensure_ascii=False), flush=True)

    print(json.dumps({
        "summary": "wide-beam replay",
        "num_beams": args.num_beams,
        "in_wide_beam": near_miss,
        "absent": absent,
    }), flush=True)


if __name__ == "__main__":
    main()
