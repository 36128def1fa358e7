"""Generate a synthetic LeanDojo-format benchmark at configurable scale.

The real LeanDojo Benchmark 4 needs network access; this produces a
structurally-identical offline stand-in — corpus.jsonl with an import DAG +
random/novel_premises splits of theorems whose annotated tactics cite real
corpus premises — so training dynamics, retrieval quality plumbing, and the
full prover loop (via the replay environment,
``reprover_tpu.prover.environment.environment_from_dataset``) can be
validated end to end at reference scale without Lean or downloads.

Learnability: each theorem's proof applies lemmas whose serialized text
shares tokens with the goal state, so a retriever has signal; the splits
follow the reference's scheme — ``random`` shuffles theorems, while
``novel_premises`` puts theorems whose positive premises never appear in
train into val/test (`LeanDojo paper` split semantics).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import random

logger = logging.getLogger(__name__)

OPS = ["+", "*", "⊓", "⊔", "∘"]
NOUNS = ["add", "mul", "inf", "sup", "comp"]
VARS = "xyzuvw"


def _pattern(rng: random.Random) -> str:
    """A distinctive structural equation (the premise's retrievable key)."""
    a = f"{rng.choice(VARS)}{rng.randrange(20)}"
    b = f"{rng.choice(VARS)}{rng.randrange(20)}"
    c = f"{rng.choice(VARS)}{rng.randrange(20)}"
    op1, op2 = rng.choice(OPS), rng.choice(OPS)
    n = f"{rng.choice(NOUNS)}_{rng.randrange(50)}"
    return f"{a} {op1} ({b} {op2} {c}) = ({a} {op1} {b}) {op2} {n} {c}"


def _perturb(pattern: str, rng: random.Random) -> str:
    """A near-duplicate: exactly one token differs (distractor family)."""
    toks = pattern.split(" ")
    # mutable positions: operators and the noun (keep the equation shape)
    idxs = [i for i, t in enumerate(toks) if t in OPS or "_" in t]
    i = rng.choice(idxs)
    if toks[i] in OPS:
        toks[i] = rng.choice([o for o in OPS if o != toks[i]])
    else:
        noun = toks[i].split("_")[0]
        toks[i] = f"{noun}_{rng.randrange(50, 99)}"
    return " ".join(toks)


def _premise(fi: int, k: int, rng: random.Random, mathlib_lengths: bool = False):
    op = rng.choice(OPS)
    noun = rng.choice(NOUNS)
    name = f"Syn.f{fi}.{noun}_{k}"
    code = (
        f"theorem {name.split('.')[-1]} (a b : Nat) : "
        f"a {op} b = b {op} a := by synth_tac_{fi}_{k}"
    )
    if mathlib_lengths:
        # Mathlib-like serialized-length distribution: lognormal body around
        # ~150 bytes with a heavy tail, clipped to the retriever's 1024-byte
        # budget (`retrieval/confs/cli_lean4_random.yaml:50`).
        target = int(min(max(rng.lognormvariate(4.8, 0.9), 40), 1100))
        hyps = []
        j = 0
        while sum(len(h) + 1 for h in hyps) + len(code) < target:
            hyps.append(
                f"(h{j} : x{j} {rng.choice(OPS)} y{j} = "
                f"{rng.choice(NOUNS)}_{rng.randrange(100)} z{j})"
            )
            j += 1
        if hyps:
            head, tail = code.split(" : ", 1)
            code = head + " " + " ".join(hyps) + " : " + tail
    line = k * 4 + 1
    return {
        "full_name": name,
        "start": [line, 1],
        "end": [line + 2, 20],
        "code": code,
    }


def _premise_hard(
    fi: int, k: int, pattern: str, rng: random.Random,
) -> dict:
    """Hard-mode premise: OPAQUE name + the pattern as the code body.

    The name shares no tokens with the pattern, so a generator can emit
    ``rw [name]`` only by reading the premise text (retrieval-augmented
    input) — the lever that makes Pass@1 depend causally on the retriever
    (VERDICT round-3 ask #4; role of the reference's premise-conditioned
    generation, `/root/reference/generation/model.py:212-262`)."""
    name = f"Syn.f{fi}.lem_{k}_{rng.randrange(16**4):04x}"
    short = name.split(".")[-1]
    code = f"theorem {short} (x y z u v w : Nat) : {pattern} := by synth"
    line = k * 4 + 1
    return {
        "full_name": name,
        "start": [line, 1],
        "end": [line + 2, 20],
        "code": code,
        "pattern": pattern,  # stripped before writing corpus.jsonl
    }


def make_corpus(
    path: str,
    n_files: int,
    per_file: int,
    seed: int,
    mathlib_lengths: bool = False,
    hard: bool = False,
    distractors: int = 4,
) -> list:
    rng = random.Random(seed)
    files = []
    with open(path, "w") as f:
        for i in range(n_files):
            imports = []
            if i > 0:
                imports = sorted(
                    {f"Syn/F{j}.lean" for j in rng.sample(range(i), min(3, i))}
                )
            if hard:
                # premises come in near-duplicate families co-located in
                # the file: every retrieval query sees the full family
                premises = []
                k = 0
                while k < per_file:
                    base = _pattern(rng)
                    fam = min(distractors, per_file - k)
                    pats = [base] + [_perturb(base, rng) for _ in range(fam - 1)]
                    for p in pats:
                        premises.append(_premise_hard(i, k, p, rng))
                        k += 1
            else:
                premises = [
                    _premise(i, k, rng, mathlib_lengths) for k in range(per_file)
                ]
            rec = {
                "path": f"Syn/F{i}.lean",
                "imports": imports,
                "premises": [
                    {kk: v for kk, v in p.items() if kk != "pattern"}
                    for p in premises
                ],
            }
            files.append(
                {"path": rec["path"], "imports": imports, "premises": premises}
            )
            f.write(json.dumps(rec) + "\n")
    return files


def make_theorems(
    files: list,
    n_theorems: int,
    seed: int,
    max_steps: int = 3,
    min_accessible: int = 0,
    hard: bool = False,
) -> list:
    """Theorems proved by applying 1..max_steps premises from imported files.

    ``min_accessible`` restricts host files to those whose transitive
    closure holds at least that many premises — needed when evaluating with
    the reference's ``num_retrieved=100`` (retrieval errors on queries with
    fewer than k accessible premises, `common.py:323-324`).

    ``hard`` states show each step's goal as the needed premise's PATTERN
    (never its name) and proofs run 2..max_steps deep, so the recorded
    tactic ``rw [opaque_name]`` is predictable only from retrieved premise
    text — un-saturating the benchmark (easy mode: generator Top-1 = 1.00).
    """
    rng = random.Random(seed + 1)
    # transitive imports per file (files are topologically ordered)
    closure = {}
    by_path = {f["path"]: f for f in files}
    prem_path = {}  # premise full_name -> defining file path
    for f in files:
        deps = set()
        for imp in f["imports"]:
            deps.add(imp)
            deps |= closure[imp]
        closure[f["path"]] = deps
        for p in f["premises"]:
            prem_path[p["full_name"]] = f["path"]

    # Candidate premise lists cached per host file (reference scale makes
    # the per-theorem rebuild O(theorems * corpus) otherwise). The cache is
    # bounded (closures at 3000 files hold tens of thousands of premises) —
    # theorems are generated grouped by host so hits stay high.
    import functools

    @functools.lru_cache(maxsize=64)
    def candidates_for(path: str) -> list:
        return [p for d in closure[path] for p in by_path[d]["premises"]]

    closure_premise_count = {
        f["path"]: sum(len(by_path[d]["premises"]) for d in closure[f["path"]])
        for f in files
    }
    hosts = [
        i
        for i in range(1, len(files))
        if closure_premise_count[files[i]["path"]] >= max(min_accessible, 1)
    ]
    assert hosts, "no file has enough accessible premises"

    host_choices = sorted(rng.choices(hosts, k=n_theorems))
    theorems = []
    for t in range(n_theorems):
        host = files[host_choices[t]]
        candidates = candidates_for(host["path"])
        steps = rng.randint(2 if hard else 1, max_steps)
        used = rng.sample(candidates, min(steps, len(candidates)))
        name = f"Syn.thm_{t}"

        def hard_state(s: int) -> str:
            # the goal shows the REMAINING patterns (current first); the
            # premise name appears nowhere — only its structural key
            pats = [p["pattern"] for p in used[s:]]
            shown = pats[:2]  # byte budget: current + one lookahead
            more = len(pats) - len(shown)
            lines = [f"case syn_{t}_{s}", "x y z u v w : Nat"]
            lines += [f"⊢ {p}" for p in shown]
            if more:
                lines.append(f"-- {more} further goals")
            return "\n".join(lines)

        goal_terms = " ".join(p["full_name"].split(".")[-1] for p in used)
        tactics = []
        for s, prem in enumerate(used):
            short = prem["full_name"].split(".")[-1]
            if hard:
                before = hard_state(s)
                after = "no goals" if s == len(used) - 1 else hard_state(s + 1)
            else:
                before = (
                    f"a b : Nat\n⊢ goal_{t} step_{s} uses {goal_terms}"
                    if s == 0
                    else f"a b : Nat\n⊢ goal_{t} after_{s} uses {goal_terms}"
                )
                after = (
                    "no goals"
                    if s == len(used) - 1
                    else f"a b : Nat\n⊢ goal_{t} after_{s + 1} uses {goal_terms}"
                )
            tactics.append(
                {
                    "tactic": f"rw [{short}]",
                    "annotated_tactic": [
                        f"rw [<a>{short}</a>]",
                        [
                            {
                                "full_name": prem["full_name"],
                                "def_path": None,  # resolved by def_pos fallback
                                "def_pos": prem["start"],
                                "def_end_pos": prem["end"],
                            }
                        ],
                    ],
                    "state_before": before,
                    "state_after": after,
                }
            )
            # fill provenance path
            tactics[-1]["annotated_tactic"][1][0]["def_path"] = prem_path[
                prem["full_name"]
            ]
        theorems.append(
            {
                "url": "https://example.com/synthetic",
                "commit": "0" * 40,
                "file_path": host["path"],
                "full_name": name,
                "start": [1, 1],
                "end": [2, 1],
                "traced_tactics": tactics,
            }
        )
    return theorems


def split_random(theorems: list, seed: int):
    rng = random.Random(seed + 2)
    order = theorems[:]
    rng.shuffle(order)
    n = len(order)
    return order[: int(n * 0.8)], order[int(n * 0.8) : int(n * 0.9)], order[int(n * 0.9) :]


def split_novel_premises(theorems: list, seed: int):
    """val/test theorems use at least one premise unseen in train
    (two passes: fix the train premise set first, then keep only genuinely
    novel holdout theorems — anything else folds back into train)."""
    rng = random.Random(seed + 3)
    order = theorems[:]
    rng.shuffle(order)

    def prems(thm):
        return {
            prov["full_name"]
            for tac in thm["traced_tactics"]
            for prov in tac["annotated_tactic"][1]
        }

    cut = int(len(order) * 0.8)
    train, holdout = order[:cut], order[cut:]
    train_prems = set()
    for thm in train:
        train_prems |= prems(thm)
    rest = [t for t in holdout if prems(t) - train_prems]
    train += [t for t in holdout if not (prems(t) - train_prems)]
    half = len(rest) // 2
    return train, rest[:half], rest[half:]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=str, default="data/synthetic_benchmark")
    parser.add_argument("--num-files", type=int, default=300)
    parser.add_argument("--premises-per-file", type=int, default=43)
    parser.add_argument("--num-theorems", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--max-steps", type=int, default=3, help="max proof steps per theorem"
    )
    parser.add_argument(
        "--mathlib-lengths",
        action="store_true",
        help="Mathlib-like premise-length distribution (lognormal, <=1.1kB)",
    )
    parser.add_argument(
        "--min-accessible",
        type=int,
        default=0,
        help="host theorems only in files with >= this many accessible premises",
    )
    parser.add_argument(
        "--hard",
        action="store_true",
        help="un-saturated mode: opaque premise names, pattern-keyed goals "
        "(tactic predictable only from retrieved premise text), "
        "near-duplicate distractor families, 2..max-steps-deep proofs",
    )
    parser.add_argument(
        "--distractors",
        type=int,
        default=4,
        help="hard mode: near-duplicate family size (same file)",
    )
    args = parser.parse_args()
    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)

    os.makedirs(args.out, exist_ok=True)
    files = make_corpus(
        os.path.join(args.out, "corpus.jsonl"),
        args.num_files,
        args.premises_per_file,
        args.seed,
        mathlib_lengths=args.mathlib_lengths,
        hard=args.hard,
        distractors=args.distractors,
    )
    theorems = make_theorems(
        files,
        args.num_theorems,
        args.seed,
        max_steps=args.max_steps,
        min_accessible=args.min_accessible,
        hard=args.hard,
    )
    with open(os.path.join(args.out, "metadata.json"), "w") as f:
        json.dump(
            {"from_repo": {"url": "https://example.com/synthetic", "commit": "0" * 40}},
            f,
        )
    for split_name, splitter in (
        ("random", split_random),
        ("novel_premises", split_novel_premises),
    ):
        d = os.path.join(args.out, split_name)
        os.makedirs(d, exist_ok=True)
        train, val, test = splitter(theorems, args.seed)
        for name, data in (("train", train), ("val", val), ("test", test)):
            with open(os.path.join(d, f"{name}.json"), "w") as f:
                json.dump(data, f)
        logger.info(
            "%s: %d train / %d val / %d test", split_name, len(train), len(val), len(test)
        )
    logger.info(
        "synthetic benchmark at %s: %d premises, %d theorems",
        args.out,
        args.num_files * args.premises_per_file,
        len(theorems),
    )


if __name__ == "__main__":
    main()
