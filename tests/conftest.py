"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4 test plan); real
TPU execution is exercised by ``bench.py`` / the driver.
"""

import os

# Force CPU even when the session env points at a TPU (JAX_PLATFORMS=axon):
# tests validate semantics + sharding on a virtual 8-device CPU mesh; real-TPU
# execution is bench.py's job.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import json
import sys
from pathlib import Path

import pytest

# jaxtyping's pytest plugin imports jax before this conftest runs, freezing
# the platform choice from the session env (axon/TPU). jax reads the config
# lazily at backend init, so overriding the config here still wins as long as
# no array has been created yet.
import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")


# --------------------------------------------------------------------- #
# Toy corpus fixture: 4 files forming a diamond import DAG
#
#   d.lean -> b.lean -> a.lean
#   d.lean -> c.lean -> a.lean
#
# a: Nat.gcd premises (the README's canonical gcd examples)
# b: two lemmas; c: one lemma; d: theorems whose proofs use them.
# --------------------------------------------------------------------- #


def _toy_corpus_records():
    def prem(name, start, end, code):
        return {"full_name": name, "start": start, "end": end, "code": code}

    return [
        {
            "path": "a.lean",
            "imports": [],
            "premises": [
                prem(
                    "Nat.gcd",
                    [1, 1],
                    [4, 40],
                    "def Nat.gcd : Nat → Nat → Nat\n| 0 y := y\n"
                    "| (succ x) y := gcd (y % succ x) (succ x)",
                ),
                prem(
                    "Nat.gcd_zero_left",
                    [6, 1],
                    [6, 60],
                    "@[simp] theorem Nat.gcd_zero_left (x : Nat) : gcd 0 x = x",
                ),
                prem(
                    "Nat.gcd_succ",
                    [8, 1],
                    [8, 80],
                    "@[simp] theorem Nat.gcd_succ (x y : Nat) : "
                    "gcd (succ x) y = gcd (y % succ x) (succ x)",
                ),
                prem(
                    "Nat.mod_self",
                    [10, 1],
                    [10, 55],
                    "@[simp] theorem Nat.mod_self (n : Nat) : n % n = 0",
                ),
            ],
        },
        {
            "path": "b.lean",
            "imports": ["a.lean"],
            "premises": [
                prem(
                    "forall_true_iff",
                    [2, 1],
                    [2, 50],
                    "theorem forall_true_iff : (α → true) ↔ true",
                ),
                prem(
                    "b_late_lemma",
                    [20, 1],
                    [20, 40],
                    "theorem b_late_lemma : 1 = 1",
                ),
            ],
        },
        {
            "path": "c.lean",
            "imports": ["a.lean"],
            "premises": [
                prem(
                    "X_sub_C_ne_zero",
                    [3, 1],
                    [3, 60],
                    "theorem X_sub_C_ne_zero (r : R) : X - C r ≠ 0",
                ),
                # Ill-formed premises that File.from_data must drop:
                prem(None, [4, 1], [4, 10], "bogus"),
                prem("foo.user__.n.bar", [5, 1], [5, 10], "bogus"),
                prem("empty_code", [6, 1], [6, 10], ""),
                prem("[mutual, defs]", [7, 1], [7, 10], "bogus"),
            ],
        },
        {
            "path": "d.lean",
            "imports": ["b.lean", "c.lean"],
            "premises": [
                prem(
                    "gcd_self",
                    [5, 1],
                    [7, 30],
                    "theorem gcd_self (n : Nat) : gcd n n = n",
                ),
                prem(
                    "d_late",
                    [30, 1],
                    [30, 20],
                    "theorem d_late : 2 = 2",
                ),
            ],
        },
    ]


@pytest.fixture(scope="session")
def toy_corpus_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus") / "corpus.jsonl"
    with open(path, "w") as f:
        for rec in _toy_corpus_records():
            f.write(json.dumps(rec) + "\n")
    return str(path)


@pytest.fixture(scope="session")
def toy_corpus(toy_corpus_path):
    from reprover_tpu.data import Corpus

    return Corpus(toy_corpus_path)


# --------------------------------------------------------------------- #
# Toy theorem dataset (LeanDojo Benchmark json schema) over the toy corpus
# --------------------------------------------------------------------- #


def _toy_theorems():
    def thm(file_path, full_name, start, end, tactics):
        return {
            "url": "https://example.com/repo",
            "commit": "0" * 40,
            "file_path": file_path,
            "full_name": full_name,
            "start": start,
            "end": end,
            "traced_tactics": tactics,
        }

    def tac(tactic, annotated, provs, before, after):
        return {
            "tactic": tactic,
            "annotated_tactic": [annotated, provs],
            "state_before": before,
            "state_after": after,
        }

    prov_gcd_succ = {
        "full_name": "Nat.gcd_succ",
        "def_path": "a.lean",
        "def_pos": [8, 1],
        "def_end_pos": [8, 80],
    }
    prov_mod_self = {
        "full_name": "Nat.mod_self",
        "def_path": "a.lean",
        "def_pos": [10, 1],
        "def_end_pos": [10, 55],
    }
    return [
        thm(
            "d.lean",
            "gcd_self",
            [5, 1],
            [7, 30],
            [
                tac(
                    "rw [Nat.gcd_succ]",
                    "rw [<a>Nat.gcd_succ</a>]",
                    [prov_gcd_succ],
                    "n : ℕ\n⊢ gcd n n = n",
                    "n : ℕ\n⊢ gcd (n % n) n = n",
                ),
                tac(
                    "simp [Nat.mod_self]",
                    "simp [<a>Nat.mod_self</a>]",
                    [prov_mod_self],
                    "n : ℕ\n⊢ gcd (n % n) n = n",
                    "no goals",
                ),
            ],
        ),
        thm(
            "d.lean",
            "d_late",
            [30, 1],
            [30, 20],
            [
                tac("rfl", "rfl", [], "⊢ 2 = 2", "no goals"),
            ],
        ),
    ]


@pytest.fixture(scope="session")
def toy_dataset_dir(tmp_path_factory):
    """train/val/test .json files (same toy theorems in each split)."""
    d = tmp_path_factory.mktemp("dataset")
    theorems = _toy_theorems()
    for split in ("train", "val", "test"):
        with open(d / f"{split}.json", "w") as f:
            json.dump(theorems, f)
    return str(d)
