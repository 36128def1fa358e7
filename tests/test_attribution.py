"""Failure-attribution harness (reprover_tpu/prover/attribution.py): the
gold-path replay must bucket failures into retrieval_miss / prompt_overflow /
generator_rank / search_budget at the FIRST broken link, reproducing the
exact search-time prompt (augment + strip marks)."""

import asyncio

from reprover_tpu.data import Pos, Premise
from reprover_tpu.prover import (
    RetrievalAugmentedTacticGenerator,
    TacticGenerator,
    attribute_failure,
    attribute_failures,
)


def _premise(name: str, code: str = "theorem x : 1 = 1 := rfl") -> Premise:
    return Premise("f.lean", name, [1, 1], [2, 1], code)


GOLD_A = _premise("Ns.gold_a")
GOLD_B = _premise("Ns.gold_b")
FILLER = [_premise(f"Ns.filler_{i}") for i in range(4)]


class MapRetriever:
    """state -> fixed retrieved list."""

    def __init__(self, table):
        self.table = table

    def retrieve(self, state, file_path, full_name, pos, k):
        got = self.table.get(state, FILLER)[:k]
        return got, [1.0] * len(got)


class SuffixGenerator(TacticGenerator):
    """Candidates keyed by the RAW state the augmented prompt ends with."""

    def __init__(self, table):
        self.table = table

    async def generate(self, state, file_path, full_name, pos, num_samples):
        for suffix, cands in self.table.items():
            if state.endswith(suffix):
                return cands[:num_samples]
        return []


def _thm(tactics):
    return {
        "url": "u", "commit": "c", "file_path": "d.lean",
        "full_name": "thm", "start": [1, 1], "end": [2, 1],
        "traced_tactics": tactics,
    }


def _step(state, tactic, premises, after="s_next"):
    return {
        "tactic": tactic,
        "annotated_tactic": [tactic, [
            {"full_name": p.full_name, "def_path": p.path,
             "def_pos": [p.start.line_nb, p.start.column_nb],
             "def_end_pos": [p.end.line_nb, p.end.column_nb]}
            for p in premises
        ]],
        "state_before": state,
        "state_after": after,
    }


class StubCorpus:
    """locate_premise keyed on (path, pos) over the fixture premises."""

    def locate_premise(self, path, pos):
        for p in [GOLD_A, GOLD_B] + FILLER:
            if p.path == path and p.start == pos:
                return p
        return None


def _rag(ret_table, gen_table, max_inp=2048):
    return RetrievalAugmentedTacticGenerator(
        SuffixGenerator(gen_table), MapRetriever(ret_table),
        max_inp_seq_len=max_inp, max_num_retrieved=4,
    )


def test_retrieval_miss():
    # gold premise NOT retrieved, and the generator (without it) misses.
    thm = _thm([_step("s0", "rw [gold_a]", [GOLD_A])])
    tac_gen = _rag({"s0": FILLER}, {"s0": [("wrong", 0.0)]})
    att = attribute_failure(thm, tac_gen, 4, corpus=StubCorpus())
    assert att.bucket == "retrieval_miss"
    assert att.first_failing_step == 0
    assert att.steps[0].num_retrieved_gold == 0
    assert not att.steps[0].gold_in_beams


def test_generator_rank():
    # evidence retrieved AND in the prompt, gold tactic still absent.
    thm = _thm([_step("s0", "rw [gold_a]", [GOLD_A])])
    tac_gen = _rag({"s0": [GOLD_A] + FILLER[:2]}, {"s0": [("wrong", 0.0)]})
    att = attribute_failure(thm, tac_gen, 4, corpus=StubCorpus())
    assert att.bucket == "generator_rank"
    assert att.steps[0].num_retrieved_gold == 1
    assert att.steps[0].worst_gold_rank == 0
    assert att.steps[0].premises_in_prompt


def test_prompt_overflow():
    # retrieved, but the byte budget evicts the gold premise's text.
    filler_big = [
        _premise(f"Ns.big_{i}", "theorem big : 1 = 1 := " + "x" * 40)
        for i in range(3)
    ]
    thm = _thm([_step("s0", "rw [gold_a]", [GOLD_A])])
    # budget fits the fillers (prepended in reverse => highest-scored
    # nearest the state) but not the gold premise at rank 3.
    max_inp = len("s0".encode()) + sum(
        len(f"{p.serialize()}\n\n".encode()) for p in filler_big
    ) + 4
    tac_gen = _rag(
        {"s0": filler_big + [GOLD_A]}, {"s0": [("wrong", 0.0)]}, max_inp
    )
    att = attribute_failure(thm, tac_gen, 4, corpus=StubCorpus())
    assert att.bucket == "prompt_overflow"
    assert att.steps[0].num_retrieved_gold == 1
    assert not att.steps[0].premises_in_prompt


def test_search_budget():
    # every gold step generable at its gold state -> the search itself
    # (ordering / expansions / timeout) is the bottleneck.
    thm = _thm([
        _step("s0", "rw [gold_a]", [GOLD_A], after="s1"),
        _step("s1", "rw [gold_b]", [GOLD_B], after="no goals"),
    ])
    tac_gen = _rag(
        {"s0": [GOLD_A] + FILLER[:2], "s1": [GOLD_B] + FILLER[:2]},
        {"s0": [("rw [gold_a]", 0.0)], "s1": [("rw [gold_b]", -0.1)]},
    )
    att = attribute_failure(thm, tac_gen, 4, corpus=StubCorpus())
    assert att.bucket == "search_budget"
    assert att.first_failing_step is None
    assert len(att.steps) == 2 and all(s.gold_in_beams for s in att.steps)


def test_first_broken_link_wins():
    # step 0 fine, step 1 misses retrieval: attribution stops AT step 1.
    thm = _thm([
        _step("s0", "rw [gold_a]", [GOLD_A], after="s1"),
        _step("s1", "rw [gold_b]", [GOLD_B], after="no goals"),
    ])
    tac_gen = _rag(
        {"s0": [GOLD_A] + FILLER[:2], "s1": FILLER},
        {"s0": [("rw [gold_a]", 0.0)], "s1": [("wrong", 0.0)]},
    )
    att = attribute_failure(thm, tac_gen, 4, corpus=StubCorpus())
    assert att.bucket == "retrieval_miss"
    assert att.first_failing_step == 1
    assert len(att.steps) == 2  # replay stopped at the broken link


def test_plain_generator_no_retrieval_stage():
    # non-RAG generator: retrieval/prompt checks pass trivially; failure
    # mass lands on generator_rank or search_budget only.
    thm = _thm([_step("s0", "tac", [GOLD_A])])

    class NoGen(TacticGenerator):
        async def generate(self, *a):
            return [("wrong", 0.0)]

    att = attribute_failure(thm, NoGen(), 4, corpus=StubCorpus())
    assert att.bucket == "generator_rank"


def test_aggregate_counts():
    thms = [
        _thm([_step("s0", "rw [gold_a]", [GOLD_A])]),
        {**_thm([_step("s1", "rw [gold_b]", [GOLD_B])]), "full_name": "thm2"},
    ]
    tac_gen = _rag(
        {"s0": FILLER, "s1": [GOLD_B] + FILLER[:2]},
        {"s0": [("wrong", 0.0)], "s1": [("rw [gold_b]", 0.0)]},
    )
    out = attribute_failures(
        thms, ["thm", "thm2"], tac_gen, 4, corpus=StubCorpus()
    )
    assert out["counts"]["retrieval_miss"] == 1
    assert out["counts"]["search_budget"] == 1
    assert len(out["records"]) == 2
