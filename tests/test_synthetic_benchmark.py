"""Synthetic benchmark generator + dataset-replay environment: the corpus
parses, provenance resolves, ground-truth replay proves everything, and the
retrieval pipeline runs end to end on the generated data."""

import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "scripts", "make_synthetic_benchmark.py"),
            "--out", out,
            "--num-files", "20",
            "--premises-per-file", "5",
            "--num-theorems", "40",
        ],
        check=True,
        cwd=REPO_ROOT,
    )
    return out


def test_corpus_and_provenance(bench_dir):
    from reprover_tpu.data import Corpus, get_all_pos_premises

    corpus = Corpus(os.path.join(bench_dir, "corpus.jsonl"))
    assert len(corpus) == 100
    with open(os.path.join(bench_dir, "random", "train.json")) as f:
        train = json.load(f)
    assert train
    for thm in train[:10]:
        for tac in thm["traced_tactics"]:
            pos = get_all_pos_premises(tac["annotated_tactic"], corpus)
            assert pos, (thm["full_name"], tac["tactic"])  # provenance resolves


def test_replay_environment_proves_ground_truth(bench_dir):
    """A generator replaying recorded tactics gets Pass@1 = 1.0."""
    from reprover_tpu.prover import (
        TacticGenerator,
        environment_from_dataset,
        evaluate,
    )

    with open(os.path.join(bench_dir, "random", "val.json")) as f:
        val = json.load(f)
    env = environment_from_dataset(val)

    lookup = {
        tac["state_before"]: tac["tactic"]
        for thm in val
        for tac in thm["traced_tactics"]
    }

    class Replay(TacticGenerator):
        async def generate(self, state, file_path, theorem_full_name,
                           theorem_pos, num_samples):
            tac = lookup.get(state)
            return [(tac, -0.1)] if tac else []

    pass_1 = evaluate(
        os.path.join(bench_dir, "random"),
        env,
        Replay(),
        timeout=60,
        num_workers=1,
    )
    assert pass_1 == pytest.approx(1.0)


def test_novel_premises_split_property(bench_dir):
    """Every val/test theorem uses >= 1 premise absent from train."""
    d = os.path.join(bench_dir, "novel_premises")
    data = {s: json.load(open(os.path.join(d, f"{s}.json"))) for s in ("train", "val", "test")}

    def prems(thms):
        return {
            prov["full_name"]
            for thm in thms
            for tac in thm["traced_tactics"]
            for prov in tac["annotated_tactic"][1]
        }

    train_prems = prems(data["train"])
    for split in ("val", "test"):
        for thm in data[split]:
            assert prems([thm]) - train_prems, thm["full_name"]


def test_retrieval_pipeline_on_synthetic(bench_dir):
    """Dense retrieval data pipeline consumes the synthetic benchmark."""
    from reprover_tpu.retrieval.datamodule import RetrievalDataModule

    dm = RetrievalDataModule(
        data_path=os.path.join(bench_dir, "random"),
        corpus_path=os.path.join(bench_dir, "corpus.jsonl"),
        num_negatives=2,
        num_in_file_negatives=1,
        batch_size=4,
        eval_batch_size=4,
        max_seq_len=256,
    )
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert batch["context_ids"].shape[0] == 4
    assert batch["premise_ids"].shape[0] == 4 * 3
    assert batch["label"].sum() >= 4  # each row has its positive marked


# ------------------------------------------------------------------ #
# Hard mode (round 4): un-saturated benchmark — VERDICT round-3 ask #4
# ------------------------------------------------------------------ #


@pytest.fixture(scope="module")
def hard_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_hard"))
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "scripts", "make_synthetic_benchmark.py"),
            "--out", out,
            "--num-files", "20",
            "--premises-per-file", "8",
            "--num-theorems", "40",
            "--max-steps", "4",
            "--hard",
            "--distractors", "4",
        ],
        check=True,
        cwd=REPO_ROOT,
    )
    return out


def test_hard_no_name_leak(hard_dir):
    """The recorded tactic's premise name must NOT appear in the state —
    the property that makes Pass@1 depend causally on retrieval (easy mode
    leaked every used name into the goal text and saturated at Top-1=1.0)."""
    for split in ("train", "val"):
        with open(os.path.join(hard_dir, "random", f"{split}.json")) as f:
            thms = json.load(f)
        for thm in thms:
            for tac in thm["traced_tactics"]:
                short = tac["tactic"][len("rw ["):-1]
                assert short not in tac["state_before"], (
                    thm["full_name"], tac["tactic"])


def test_hard_state_contains_pattern(hard_dir):
    """Each state's leading goal is the needed premise's code pattern
    (the retrieval signal), and proofs are >= 2 steps deep."""
    from reprover_tpu.data import Corpus

    corpus = Corpus(os.path.join(hard_dir, "corpus.jsonl"))
    by_name = {p.full_name: p for p in corpus.all_premises}
    with open(os.path.join(hard_dir, "random", "train.json")) as f:
        train = json.load(f)
    for thm in train[:20]:
        assert len(thm["traced_tactics"]) >= 2
        for tac in thm["traced_tactics"]:
            prov = tac["annotated_tactic"][1][0]
            prem = by_name[prov["full_name"]]
            pattern = prem.code.split(") : ", 1)[1].split(" := ")[0]
            first_goal = next(
                line for line in tac["state_before"].split("\n")
                if line.startswith("⊢ ")
            )
            assert first_goal == f"⊢ {pattern}", (first_goal, pattern)


def test_hard_distractor_families(hard_dir):
    """Premises come in same-file near-duplicate families: for most
    premises another premise in the same file differs in at most 2
    whitespace tokens of the pattern."""
    import json as _json

    files = [_json.loads(l) for l in open(os.path.join(hard_dir, "corpus.jsonl"))]
    checked = with_sibling = 0
    for f in files[:10]:
        pats = [
            p["code"].split(") : ", 1)[1].split(" := ")[0].split(" ")
            for p in f["premises"]
        ]
        for i, pi in enumerate(pats):
            checked += 1
            for j, pj in enumerate(pats):
                if i == j or len(pi) != len(pj):
                    continue
                if sum(a != b for a, b in zip(pi, pj)) <= 2:
                    with_sibling += 1
                    break
    assert with_sibling >= 0.7 * checked, (with_sibling, checked)


def test_hard_replay_proves_ground_truth(hard_dir):
    """Replaying recorded tactics still proves everything in hard mode."""
    from reprover_tpu.prover import (
        TacticGenerator,
        environment_from_dataset,
        evaluate,
    )

    with open(os.path.join(hard_dir, "random", "val.json")) as f:
        val = json.load(f)
    env = environment_from_dataset(val)
    lookup = {
        tac["state_before"]: tac["tactic"]
        for thm in val
        for tac in thm["traced_tactics"]
    }

    class Replay(TacticGenerator):
        async def generate(self, state, file_path, theorem_full_name,
                           theorem_pos, num_samples):
            tac = lookup.get(state)
            return [(tac, -0.1)] if tac else []

    pass_1 = evaluate(
        os.path.join(hard_dir, "random"),
        env,
        Replay(),
        timeout=60,
        num_workers=1,
    )
    assert pass_1 == pytest.approx(1.0)
