"""Prover subsystem tests: search tree semantics, best-first search against
a fake Lean environment, fault containment, the Pass@1 harness, and the
shared inference service (SURVEY.md §4 test plan items 3 and 6)."""

import asyncio
import json
import math
import os

import pytest

from reprover_tpu.data import Pos
from reprover_tpu.prover import (
    BestFirstSearchProver,
    DistributedProver,
    Edge,
    ErrorNode,
    FakeEnvironment,
    FixedTacticGenerator,
    InferenceService,
    InternalNode,
    LeanError,
    ProofFinished,
    ProofFinishedNode,
    RemoteTacticGenerator,
    RepoSpec,
    Status,
    TacticGenerator,
    TacticState,
    Theorem,
    aggregate_pass1,
    evaluate,
    get_theorems,
)

REPO = RepoSpec("https://example.com/repo", "0" * 40)


def thm(name: str) -> Theorem:
    return Theorem(REPO, "d.lean", name)


class ScriptedGenerator(TacticGenerator):
    """state pp -> fixed candidate list (descending logprob)."""

    def __init__(self, table):
        self.table = table

    async def generate(self, state, file_path, theorem_full_name, theorem_pos, num_samples):
        return list(self.table.get(state, []))[:num_samples]


# ------------------------------------------------------------------ #
# Search tree unit semantics
# ------------------------------------------------------------------ #


class TestSearchTree:
    def test_status_propagation_proved(self):
        root = InternalNode(TacticState("g"), 0.0)
        mid = InternalNode(TacticState("m"), -1.0)
        leaf = ProofFinishedNode(ProofFinished())
        e2 = Edge("win", src=mid, dst=leaf)
        mid.in_edges.append(Edge("t", src=root, dst=mid))
        root.out_edges = [mid.in_edges[0]]
        assert root.status == Status.OPEN
        mid.out_edges = [e2]
        assert mid.status == Status.PROVED
        assert root.status == Status.PROVED
        assert root.distance_to_proof == 2
        proof = root.extract_proof()
        assert [e.tactic for e in proof] == ["t", "win"]

    def test_status_propagation_failed(self):
        root = InternalNode(TacticState("g"), 0.0)
        err = ErrorNode(LeanError("no"))
        root.out_edges = [Edge("bad", src=root, dst=err)]
        assert root.status == Status.FAILED
        assert root.distance_to_proof == math.inf
        assert root.extract_proof() is None

    def test_empty_out_edges_fails(self):
        root = InternalNode(TacticState("g"), 0.0)
        root.out_edges = []
        assert root.status == Status.FAILED

    def test_node_identity_is_state_only(self):
        a = InternalNode(TacticState("s"), -1.0)
        b = InternalNode(TacticState("s"), -99.0)
        assert a == b and hash(a) == hash(b)
        # max-first ordering: higher cumulative logprob sorts first
        assert a < b

    def test_explore_twice_raises(self):
        n = InternalNode(TacticState("s"), 0.0)
        n.out_edges = []
        with pytest.raises(RuntimeError):
            n.out_edges = []


# ------------------------------------------------------------------ #
# Best-first search on a fake environment
# ------------------------------------------------------------------ #


def linear_env():
    """G --t1--> A --t2--> QED, with a failing distractor."""
    return FakeEnvironment(
        init_states={"goal": "⊢ G"},
        transitions={
            ("⊢ G", "t1"): "⊢ A",
            ("⊢ A", "t2"): "QED",
        },
    )


class TestBestFirstSearch:
    def test_proves_linear(self):
        gen = ScriptedGenerator(
            {
                "⊢ G": [("t1", -0.1), ("bad", -2.0)],
                "⊢ A": [("t2", -0.1), ("bad", -3.0)],
            }
        )
        prover = BestFirstSearchProver(
            gen, linear_env(), timeout=60, max_expansions=None,
            num_sampled_tactics=4, debug=True,
        )
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result is not None
        assert result.status == Status.PROVED
        assert result.proof == ["t1", "t2"]
        assert result.num_searched_nodes == 2
        assert result.actor_time >= 0 and result.environment_time >= 0

    def test_first_finish_stops_candidate_loop(self):
        """Candidates after the first ProofFinished are never executed
        (`proof_search.py:195-201`)."""
        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={("⊢ G", "t1"): "QED", ("⊢ G", "t2"): "QED"},
        )
        gen = ScriptedGenerator({"⊢ G": [("t1", -0.1), ("t2", -0.2)]})
        prover = BestFirstSearchProver(gen, env, 60, None, 4, debug=True)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.PROVED
        assert result.proof == ["t1"]
        # root explored with exactly one edge (t2 skipped)
        assert len(prover.root.out_edges) == 1

    def test_dedup_by_state(self):
        """Two tactics reaching the same state share one node
        (`proof_search.py:249-252`)."""
        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={
                ("⊢ G", "t1"): "⊢ A",
                ("⊢ G", "t2"): "⊢ A",
                ("⊢ A", "t3"): "QED",
            },
        )
        gen = ScriptedGenerator(
            {"⊢ G": [("t1", -0.1), ("t2", -0.2)], "⊢ A": [("t3", -0.1)]}
        )
        prover = BestFirstSearchProver(gen, env, 60, None, 4, debug=True)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.PROVED
        # G, A, QED -> 3 distinct responses/nodes despite 2 paths into A
        assert result.num_total_nodes == 3
        # A was expanded once, not twice
        assert result.num_searched_nodes == 2

    def test_best_first_order(self):
        """The higher-cumulative-logprob node is expanded first."""
        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={
                ("⊢ G", "cheap"): "⊢ A",
                ("⊢ G", "pricey"): "⊢ B",
                ("⊢ A", "finishA"): "QED",
                ("⊢ B", "finishB"): "QED",
            },
        )
        gen = ScriptedGenerator(
            {
                "⊢ G": [("cheap", -0.1), ("pricey", -5.0)],
                "⊢ A": [("finishA", -0.1)],
                "⊢ B": [("finishB", -0.1)],
            }
        )
        prover = BestFirstSearchProver(gen, env, 60, None, 4, debug=True)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.proof == ["cheap", "finishA"]

    def test_exhaustion_fails(self):
        env = FakeEnvironment(init_states={"goal": "⊢ G"}, transitions={})
        gen = ScriptedGenerator({"⊢ G": [("t1", -0.1)]})
        prover = BestFirstSearchProver(gen, env, 60, None, 4, debug=True)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.FAILED
        assert result.proof is None

    def test_resource_limit_resets_root_to_open(self):
        """The reference quirk (`proof_search.py:153-161`): hitting the
        expansion budget resets the root to OPEN even if it was just
        proved."""
        env = FakeEnvironment(
            init_states={"goal": "⊢ G"}, transitions={("⊢ G", "t1"): "QED"}
        )
        gen = ScriptedGenerator({"⊢ G": [("t1", -0.1)]})
        prover = BestFirstSearchProver(
            gen, env, timeout=60, max_expansions=0, num_sampled_tactics=4
        )
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.OPEN  # proof found but limit hit
        assert result.proof is None

    def test_crash_keeps_partial_tree(self):
        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={("⊢ G", "t1"): "⊢ A", ("⊢ A", "t2"): "QED"},
            crash_after=1,
        )
        gen = ScriptedGenerator(
            {"⊢ G": [("t1", -0.1)], "⊢ A": [("t2", -0.1)]}
        )
        prover = BestFirstSearchProver(gen, env, 60, None, 4)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result is not None  # crash != discard
        assert result.status == Status.OPEN
        assert result.num_total_nodes == 2  # partial tree kept

    def test_init_error_discards(self):
        env = FakeEnvironment(init_states={}, transitions={})
        gen = ScriptedGenerator({})
        prover = BestFirstSearchProver(gen, env, 60, None, 4)
        assert prover.search(thm("goal"), Pos(1, 1)) is None

    def test_rag_generator_strips_marks_from_augmented_state(self):
        # The generator trains on mark-free augmented states
        # (generation/datamodule.py strips <a>/</a>); the search path must
        # match that distribution. Regression for the train/search skew that
        # took a Top-1=1.0 generator to Pass@1=0 on the hard benchmark.
        from reprover_tpu.data import Premise
        from reprover_tpu.prover import RetrievalAugmentedTacticGenerator

        premise = Premise(
            "f.lean", "Ns.lemma_a", [1, 1], [2, 1],
            "theorem lemma_a : 1 = 1 := rfl",
        )
        assert "<a>" in premise.serialize()  # the skew's ingredient

        class StubRetriever:
            def retrieve(self, state, file_path, full_name, pos, k):
                return [premise], [1.0]

        class CapturingGen(TacticGenerator):
            def __init__(self):
                self.seen = []

            async def generate(self, state, *args):
                self.seen.append(state)
                return [("rfl", 0.0)]

        inner = CapturingGen()
        rag = RetrievalAugmentedTacticGenerator(
            inner, StubRetriever(), max_inp_seq_len=1024
        )
        asyncio.run(
            rag.generate("⊢ 1 = 1", "d.lean", "t", Pos(1, 1), 4)
        )
        (aug,) = inner.seen
        assert "<a>" not in aug and "</a>" not in aug
        assert "Ns.lemma_a" in aug and aug.endswith("⊢ 1 = 1")

    def test_fixed_tactic_generator_wraps_in_braces(self):
        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={("⊢ G", "{ rfl }"): "QED"},
        )
        prover = BestFirstSearchProver(
            FixedTacticGenerator("rfl"), env, 60, None, 1, debug=True
        )
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.PROVED
        assert result.proof == ["{ rfl }"]


# ------------------------------------------------------------------ #
# Pass@1 evaluation harness
# ------------------------------------------------------------------ #


def _write_dataset(tmp_path, names):
    data = [
        {
            "url": REPO.url,
            "commit": REPO.commit,
            "file_path": "d.lean",
            "full_name": n,
            "start": [1, 1],
            "end": [2, 1],
            "traced_tactics": [],
        }
        for n in names
    ]
    with open(os.path.join(tmp_path, "val.json"), "w") as f:
        json.dump(data, f)


class TestEvaluate:
    def test_md5_sort_deterministic(self, tmp_path):
        _write_dataset(tmp_path, ["b_thm", "a_thm", "c_thm"])
        t1, p1 = get_theorems(str(tmp_path))
        t2, p2 = get_theorems(str(tmp_path))
        assert [t.full_name for t in t1] == [t.full_name for t in t2]
        # md5 order differs from lexicographic for this trio
        import hashlib

        expected = sorted(
            ["b_thm", "a_thm", "c_thm"],
            key=lambda n: hashlib.md5(f"d.lean:{n}".encode()).hexdigest(),
        )
        assert [t.full_name for t in t1] == expected

    def test_name_filter(self, tmp_path):
        _write_dataset(tmp_path, ["b_thm", "a_thm", "c_thm"])
        import hashlib

        prefix = hashlib.md5(b"a_thm").hexdigest()[:4]
        theorems, _ = get_theorems(str(tmp_path), name_filter=prefix)
        assert [t.full_name for t in theorems] == ["a_thm"]

    def test_pass1_single_worker(self, tmp_path):
        _write_dataset(tmp_path, ["provable", "unprovable", "broken"])
        env = FakeEnvironment(
            init_states={"provable": "⊢ P", "unprovable": "⊢ Q"},
            transitions={("⊢ P", "{ rfl }"): "QED"},
        )
        pass_1 = evaluate(
            str(tmp_path),
            env,
            FixedTacticGenerator("rfl"),
            timeout=60,
            num_workers=1,
        )
        # provable: PROVED; unprovable: FAILED; broken: init error, discarded
        assert pass_1 == pytest.approx(0.5)

    def test_aggregate_nan_when_all_discarded(self):
        assert math.isnan(aggregate_pass1([None, None]))


# ------------------------------------------------------------------ #
# Multiprocess pool + shared inference service
# ------------------------------------------------------------------ #


class _StubGeneratorModel:
    """Stands in for TacticGeneratorModel in service tests."""

    max_inp_seq_len = 512

    def generate(self, states, num_samples):
        out = []
        for s in states:
            if "⊢ G" in s:
                out.append([("t1", -0.1), ("t1", -0.2), ("bad", -1.0)])
            elif "⊢ A" in s:
                out.append([("t2", -0.1)])
            else:
                out.append([("noop", -9.9)])
        return out


class TestServiceAndDistributed:
    def test_service_roundtrip_and_dedup(self):
        service = InferenceService(_StubGeneratorModel())
        client = service.client()
        service.start()
        try:
            gen = RemoteTacticGenerator(client)
            cands = asyncio.run(
                gen.generate("⊢ G", "d.lean", "goal", Pos(1, 1), 3)
            )
            # dedup keeps the first (t1, -0.1); bad kept
            assert cands == [("t1", -0.1), ("bad", -1.0)]
        finally:
            service.stop()

    def test_service_backed_search(self):
        service = InferenceService(_StubGeneratorModel())
        client = service.client()
        service.start()
        try:
            env = FakeEnvironment(
                init_states={"goal": "⊢ G"},
                transitions={("⊢ G", "t1"): "⊢ A", ("⊢ A", "t2"): "QED"},
            )
            prover = BestFirstSearchProver(
                RemoteTacticGenerator(client), env, 60, None, 4, debug=True
            )
            result = prover.search(thm("goal"), Pos(1, 1))
            assert result.status == Status.PROVED
            assert result.proof == ["t1", "t2"]
            assert service.stats["requests"] >= 2
        finally:
            service.stop()

    @pytest.mark.slow
    def test_multiworker_pass1_through_service(self, tmp_path):
        """2 worker processes prove theorems via the parent's shared
        InferenceService (the reference's shared-vLLM topology,
        `proof_search.py:332-366`)."""
        from reprover_tpu.prover import evaluate

        _write_dataset(tmp_path, ["provable", "unprovable"])
        env = FakeEnvironment(
            init_states={"provable": "⊢ G", "unprovable": "⊢ Q"},
            transitions={("⊢ G", "t1"): "⊢ A", ("⊢ A", "t2"): "QED"},
        )
        service = InferenceService(_StubGeneratorModel())
        service.start()
        try:
            pass_1 = evaluate(
                str(tmp_path),
                env,
                FixedTacticGenerator("unused"),
                timeout=60,
                num_workers=2,
                make_client=service.client,
            )
        finally:
            service.stop()
        assert pass_1 == pytest.approx(0.5)
        assert service.stats["requests"] >= 2  # workers reached the service

    @pytest.mark.slow
    def test_multiprocess_pool(self, tmp_path):
        _write_dataset(tmp_path, ["provable", "unprovable", "broken", "p2"])
        env = FakeEnvironment(
            init_states={"provable": "⊢ P", "unprovable": "⊢ Q", "p2": "⊢ P"},
            transitions={("⊢ P", "{ rfl }"): "QED"},
        )
        pass_1 = evaluate(
            str(tmp_path),
            env,
            FixedTacticGenerator("rfl"),
            timeout=60,
            num_workers=2,
        )
        assert pass_1 == pytest.approx(2 / 3)


class TestEdgeResults:
    def test_tactic_timeout_result_is_error_node(self):
        """A returned TacticTimeout terminates the branch as FAILED
        (`proof_search.py:256-261`)."""
        from reprover_tpu.prover import TacticTimeout

        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={("⊢ G", "slow"): TacticTimeout()},
        )
        gen = ScriptedGenerator({"⊢ G": [("slow", -0.1)]})
        prover = BestFirstSearchProver(gen, env, 60, None, 4, debug=True)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.FAILED

    def test_proof_given_up_is_error_node(self):
        from reprover_tpu.prover import ProofGivenUp

        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={("⊢ G", "sorry"): ProofGivenUp("⊢ G")},
        )
        gen = ScriptedGenerator({"⊢ G": [("sorry", -0.1)]})
        prover = BestFirstSearchProver(gen, env, 60, None, 4, debug=True)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.FAILED

    def test_wallclock_timeout_resets_root(self):
        """Global timeout (not expansions) hits the same root-reset quirk."""
        import time as _time

        class SlowEnv(FakeEnvironment):
            pass

        env = FakeEnvironment(
            init_states={"goal": "⊢ G"},
            transitions={("⊢ G", "t1"): "⊢ A", ("⊢ A", "t2"): "⊢ B"},
        )

        class SlowGen(TacticGenerator):
            async def generate(self, state, file_path, theorem_full_name,
                               theorem_pos, num_samples):
                _time.sleep(0.15)
                return {"⊢ G": [("t1", -0.1)], "⊢ A": [("t2", -0.1)]}.get(state, [])

        prover = BestFirstSearchProver(SlowGen(), env, timeout=0.1,
                                       max_expansions=None, num_sampled_tactics=4)
        result = prover.search(thm("goal"), Pos(1, 1))
        assert result.status == Status.OPEN  # limit hit, root reset
        assert result.total_time >= 0.1
