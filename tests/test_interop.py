"""Loading reference-produced pickles: class paths remap onto our classes."""

import dataclasses
import io
import pickle
import sys
import types

import pytest

from reprover_tpu.data import Context, Pos, Premise
from reprover_tpu.data.interop import load_reference_pickle, loads_reference_pickle


def _fake_reference_modules():
    """Simulate the reference's pickle environment: a `common` module with
    structurally-identical (test-local, independently-written) classes."""
    common = types.ModuleType("common")

    @dataclasses.dataclass(frozen=True)
    class RefPos:
        line_nb: int
        column_nb: int

    @dataclasses.dataclass(unsafe_hash=True)
    class RefPremise:
        path: str
        full_name: str
        start: RefPos
        end: RefPos
        code: str

    @dataclasses.dataclass(frozen=True)
    class RefContext:
        path: str
        theorem_full_name: str
        theorem_pos: RefPos
        state: str

    # pickle-by-reference needs the classes importable under those names
    RefPos.__module__ = "lean_dojo"
    RefPos.__qualname__ = "Pos"
    RefPremise.__module__ = "common"
    RefPremise.__qualname__ = "Premise"
    RefContext.__module__ = "common"
    RefContext.__qualname__ = "Context"
    common.Premise = RefPremise
    common.Context = RefContext
    lean_dojo = types.ModuleType("lean_dojo")
    lean_dojo.Pos = RefPos
    return common, lean_dojo, RefPos, RefPremise, RefContext


def _reference_pickle_bytes():
    common, lean_dojo, RefPos, RefPremise, RefContext = _fake_reference_modules()
    sys.modules["common"] = common
    sys.modules["lean_dojo"] = lean_dojo
    try:
        record = {
            "file_path": "d.lean",
            "full_name": "gcd_self",
            "start": [5, 1],
            "tactic_idx": 0,
            "context": RefContext(
                "d.lean", "gcd_self", RefPos(5, 1), "n : ℕ\n⊢ gcd n n = n"
            ),
            "all_pos_premises": [
                RefPremise(
                    "a.lean",
                    "Nat.gcd_succ",
                    RefPos(8, 1),
                    RefPos(8, 80),
                    "theorem Nat.gcd_succ : True",
                )
            ],
            "retrieved_premises": [
                RefPremise(
                    "a.lean",
                    "Nat.mod_self",
                    RefPos(10, 1),
                    RefPos(10, 55),
                    "theorem Nat.mod_self (n : Nat) : n % n = 0",
                )
            ],
            "scores": [0.9],
        }
        return pickle.dumps([record])
    finally:
        del sys.modules["common"]
        del sys.modules["lean_dojo"]


def test_reference_pickle_remaps_to_our_classes(tmp_path):
    data = _reference_pickle_bytes()
    # plain pickle.loads must fail (modules are gone)
    with pytest.raises(Exception):
        pickle.loads(data)

    records = loads_reference_pickle(data)
    rec = records[0]
    assert isinstance(rec["context"], Context)
    assert isinstance(rec["context"].theorem_pos, Pos)
    prem = rec["all_pos_premises"][0]
    assert isinstance(prem, Premise)
    assert prem.full_name == "Nat.gcd_succ"
    assert isinstance(prem.start, Pos) and prem.start == Pos(8, 1)
    # our methods work on the remapped objects
    assert "<a>Nat.gcd_succ</a>" in prem.serialize() or "Nat.gcd_succ" in prem.serialize()
    assert "⊢" in rec["context"].serialize()

    # file-based API
    p = tmp_path / "ref_preds.pickle"
    p.write_bytes(data)
    assert load_reference_pickle(str(p))[0]["full_name"] == "gcd_self"


def test_our_own_pickles_still_load():
    prem = Premise("a.lean", "foo.bar", Pos(1, 1), Pos(2, 2), "theorem foo.bar : X")
    data = pickle.dumps({"p": prem})
    out = loads_reference_pickle(data)
    assert out["p"] == prem


def test_unmapped_reference_class_rejected():
    mod = types.ModuleType("common")

    class Weird:
        pass

    Weird.__module__ = "common"
    Weird.__qualname__ = "Weird"
    mod.Weird = Weird
    sys.modules["common"] = mod
    try:
        data = pickle.dumps(Weird())
    finally:
        del sys.modules["common"]
    with pytest.raises(pickle.UnpicklingError, match="no mapping"):
        loads_reference_pickle(data)
