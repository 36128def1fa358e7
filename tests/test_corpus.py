"""Corpus DAG, accessibility bitmasks, serialization, and nearest-premise query."""

import numpy as np
import pytest

from reprover_tpu.data import (
    Context,
    Corpus,
    IndexedCorpus,
    Pos,
    Premise,
    PremiseSet,
    format_augmented_state,
    get_all_pos_premises,
    remove_marks,
)


def test_file_filtering(toy_corpus):
    # c.lean declared 5 premises, 4 are ill-formed and must be dropped.
    assert toy_corpus.num_premises("c.lean") == 1
    assert len(toy_corpus) == 4 + 2 + 1 + 2


def test_transitive_closure(toy_corpus):
    assert toy_corpus.imports_transitively("d.lean", "a.lean")  # indirect
    assert toy_corpus.imports_transitively("d.lean", "b.lean")  # direct
    assert toy_corpus.imports_transitively("b.lean", "a.lean")
    assert not toy_corpus.imports_transitively("a.lean", "b.lean")
    assert not toy_corpus.imports_transitively("b.lean", "c.lean")
    assert not toy_corpus.imports_transitively("a.lean", "a.lean")  # no self-edge
    assert set(toy_corpus.get_dependencies("d.lean")) == {
        "a.lean",
        "b.lean",
        "c.lean",
    }


def test_accessibility_mask(toy_corpus):
    # At gcd_self (d.lean:5), all imported premises are accessible, but
    # nothing later in d.lean and not gcd_self itself (end > pos).
    mask = toy_corpus.accessible_mask("d.lean", Pos(5, 1))
    names = {
        toy_corpus.all_premises[i].full_name for i in np.nonzero(mask)[0]
    }
    assert names == {
        "Nat.gcd",
        "Nat.gcd_zero_left",
        "Nat.gcd_succ",
        "Nat.mod_self",
        "forall_true_iff",
        "b_late_lemma",
        "X_sub_C_ne_zero",
    }
    # Later in d.lean: gcd_self (ends at 7,30) now accessible, d_late not.
    mask2 = toy_corpus.accessible_mask("d.lean", Pos(10, 1))
    names2 = {
        toy_corpus.all_premises[i].full_name for i in np.nonzero(mask2)[0]
    }
    assert "gcd_self" in names2 and "d_late" not in names2


def test_accessible_indexes_match_premise_set(toy_corpus):
    idxs = toy_corpus.get_accessible_premise_indexes("d.lean", Pos(5, 1))
    ps = toy_corpus.get_accessible_premises("d.lean", Pos(5, 1))
    assert len(idxs) == len(ps)
    for i in idxs:
        assert toy_corpus.all_premises[i] in ps


def test_same_file_prefix_semantics(toy_corpus):
    # In b.lean at line 10: forall_true_iff (ends line 2) accessible,
    # b_late_lemma (line 20) not.
    mask = toy_corpus.accessible_mask("b.lean", Pos(10, 1))
    names = {toy_corpus.all_premises[i].full_name for i in np.nonzero(mask)[0]}
    assert "forall_true_iff" in names
    assert "b_late_lemma" not in names


def test_locate_premise(toy_corpus):
    p = toy_corpus.locate_premise("a.lean", Pos(2, 5))  # inside Nat.gcd span
    assert p is not None and p.full_name == "Nat.gcd"
    assert toy_corpus.locate_premise("a.lean", Pos(100, 1)) is None
    assert toy_corpus.locate_premise("nope.lean", Pos(1, 1)) is None


def test_premise_serialize_marks():
    p = Premise(
        "a.lean",
        "Nat.gcd_succ",
        Pos(1, 1),
        Pos(1, 80),
        "@[simp] theorem Nat.gcd_succ (x y : Nat) : gcd (succ x) y = x",
    )
    s = p.serialize()
    assert "<a>Nat.gcd_succ</a>" in s
    # Longest-suffix marking: falls back to the bare name when the full
    # dotted name does not appear after whitespace.
    p2 = Premise("a.lean", "Foo.bar", Pos(1, 1), Pos(1, 30), "lemma bar : 1 = 1")
    assert "<a>Foo.bar</a>" in p2.serialize()
    # _root_ qualified occurrence is marked directly.
    p3 = Premise("a.lean", "baz", Pos(1, 1), Pos(1, 30), "lemma _root_.baz : 2 = 2")
    assert "<a>baz</a>" in p3.serialize()
    # Guillemet-quoted names.
    p4 = Premise("a.lean", "qux", Pos(1, 1), Pos(1, 30), "lemma «qux» : 3 = 3")
    assert "<a>qux</a>" in p4.serialize()


def test_context_validation():
    Context("a.lean", "thm", Pos(1, 1), "n : ℕ\n⊢ gcd n n = n")
    with pytest.raises(AssertionError):
        Context("a.lean", "thm", Pos(1, 1), "no turnstile here")
    with pytest.raises(AssertionError):
        Context("a.lean", "thm", Pos(1, 1), "⊢ <a>marked</a>")


def test_premise_set():
    ps = PremiseSet()
    p = Premise("a.lean", "x", Pos(1, 1), Pos(1, 2), "lemma x")
    assert p not in ps and len(ps) == 0
    ps.add(p)
    assert p in ps and len(ps) == 1
    ps.add(p)
    assert len(ps) == 1
    assert list(ps) == [p]


def test_remove_marks():
    assert remove_marks("<a>foo</a> bar <a>baz</a>") == "foo bar baz"


def test_format_augmented_state():
    ps = [
        Premise("a.lean", f"p{i}", Pos(1, 1), Pos(1, 9), f"lemma p{i} : {i} = {i}")
        for i in range(3)
    ]
    state = "⊢ True"
    # No budget: premises prepended in reverse (best premise adjacent to state).
    s = format_augmented_state(state, ps)
    i0 = s.index("<a>p0</a>")
    i1 = s.index("<a>p1</a>")
    i2 = s.index("<a>p2</a>")
    assert i2 < i1 < i0 < s.index("⊢")
    assert s.endswith(state)
    # Tight budget: only the state fits.
    assert format_augmented_state(state, ps, max_len=len(state.encode()) + 1) == state
    # p_drop=1 drops everything.
    assert format_augmented_state(state, ps, p_drop=1.0) == state


def test_format_augmented_state_skips_oversized_but_keeps_later():
    big = Premise("a.lean", "big", Pos(1, 1), Pos(1, 9), "x" * 500)
    small = Premise("a.lean", "small", Pos(1, 1), Pos(1, 9), "lemma small : 1=1")
    state = "⊢ True"
    budget = len(state.encode()) + 100
    s = format_augmented_state(state, [big, small], max_len=budget)
    assert "small" in s and "xxxx" not in s


def test_get_all_pos_premises(toy_corpus):
    annot_tac = (
        "exact Nat.gcd_succ",
        [
            {"def_path": "a.lean", "def_pos": [8, 3]},
            {"def_path": "a.lean", "def_pos": [8, 5]},  # same premise, dedup
            {"def_path": "nowhere.lean", "def_pos": [1, 1]},  # dropped
        ],
    )
    out = get_all_pos_premises(annot_tac, toy_corpus)
    assert [p.full_name for p in out] == ["Nat.gcd_succ"]


def test_get_nearest_premises_filtering(toy_corpus):
    n = len(toy_corpus)
    dim = 8
    rng = np.random.default_rng(0)
    prem_emb = rng.normal(size=(n, dim)).astype(np.float32)
    prem_emb /= np.linalg.norm(prem_emb, axis=1, keepdims=True)
    ctx = Context("d.lean", "gcd_self", Pos(5, 1), "n : ℕ\n⊢ gcd n n = n")
    ctx_emb = rng.normal(size=(1, dim)).astype(np.float32)
    ctx_emb /= np.linalg.norm(ctx_emb)

    results, scores = toy_corpus.get_nearest_premises(prem_emb, [ctx], ctx_emb, k=3)
    assert len(results[0]) == 3
    # Scores descending, all from accessible set.
    assert scores[0] == sorted(scores[0], reverse=True)
    acc = toy_corpus.get_accessible_premises("d.lean", Pos(5, 1))
    for p in results[0]:
        assert p in acc
    # Reference-parity brute force: argsort everything then filter.
    sims = (ctx_emb @ prem_emb.T)[0]
    order = np.argsort(-sims, kind="stable")
    expected = [
        toy_corpus.all_premises[i] for i in order if toy_corpus.all_premises[i] in acc
    ][:3]
    assert results[0] == expected


def test_get_nearest_premises_raises_when_too_few(toy_corpus):
    n = len(toy_corpus)
    prem_emb = np.eye(n, 8, dtype=np.float32)
    # a.lean at line 1: nothing accessible yet.
    ctx = Context("a.lean", "Nat.gcd", Pos(1, 1), "⊢ True")
    ctx_emb = np.ones((1, 8), dtype=np.float32)
    with pytest.raises(ValueError):
        toy_corpus.get_nearest_premises(prem_emb, [ctx], ctx_emb, k=1)


def test_indexed_corpus_roundtrip(toy_corpus, tmp_path):
    emb = np.arange(len(toy_corpus) * 4, dtype=np.float32).reshape(len(toy_corpus), 4)
    ic = IndexedCorpus(toy_corpus, emb)
    out = str(tmp_path / "indexed")
    ic.save(out)
    loaded = IndexedCorpus.load(out)
    np.testing.assert_array_equal(loaded.embeddings, emb)
    assert len(loaded.corpus) == len(toy_corpus)
    assert [p.full_name for p in loaded.corpus.all_premises] == [
        p.full_name for p in toy_corpus.all_premises
    ]


def test_topological_order_enforced(tmp_path):
    import json

    bad = tmp_path / "bad.jsonl"
    with open(bad, "w") as f:
        f.write(json.dumps({"path": "x.lean", "imports": ["y.lean"], "premises": []}) + "\n")
        f.write(json.dumps({"path": "y.lean", "imports": [], "premises": []}) + "\n")
    with pytest.raises(AssertionError):
        Corpus(str(bad))
