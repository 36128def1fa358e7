"""Aux scripts + API generator parsing + shipped config files."""

import asyncio
import dataclasses
import json
import os

import pytest

from reprover_tpu.data import Pos
from reprover_tpu.generation.preprocess import TEMPLATE, preprocess_split
from reprover_tpu.prover.api_generator import ApiTacticGenerator, parse_tactic_tuples

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestPreprocess:
    def test_llama_factory_format(self, toy_dataset_dir, tmp_path):
        dst = str(tmp_path / "pairs.json")
        n = preprocess_split(os.path.join(toy_dataset_dir, "train.json"), dst)
        assert n == 3
        with open(dst) as f:
            data = json.load(f)
        assert all(d["instruction"].startswith("[GOAL]\n") for d in data)
        assert all(d["instruction"].endswith("\n[PROOFSTEP]\n") for d in data)
        assert all(d["input"] == "" for d in data)
        assert {d["output"] for d in data} == {
            "rw [Nat.gcd_succ]",
            "simp [Nat.mod_self]",
            "rfl",
        }
        assert TEMPLATE % "X" == "[GOAL]\nX\n[PROOFSTEP]\n"


class TestApiGenerator:
    def test_parse_tuples(self):
        out = "Sure! #(rfl, 0.9)#, #(simp [foo, bar], 0.75)#, #(broken"
        assert parse_tactic_tuples(out) == [
            ("rfl", 0.9),
            ("simp [foo, bar]", 0.75),
        ]

    def test_parse_skips_malformed(self):
        out = "#(no confidence here)# #(ok, 0.5)#"
        assert parse_tactic_tuples(out) == [("ok", 0.5)]

    def test_generate_retry_then_success(self):
        calls = []

        def complete(prompt):
            calls.append(prompt)
            if len(calls) == 1:
                return "garbage"  # under-delivers -> retry
            return "#(tac_b, 0.4)#, #(tac_a, 0.8)#"

        gen = ApiTacticGenerator(complete=complete, threshold=0.9, num_retries=3)
        result = asyncio.run(gen.generate("⊢ x", "f.lean", "thm", Pos(1, 1), 2))
        assert result == [("tac_a", 0.8), ("tac_b", 0.4)]  # score-sorted
        assert len(calls) == 2
        # over-request by 1/threshold
        assert "exactly 2" in calls[0]

    def test_generate_unparsable_raises(self):
        gen = ApiTacticGenerator(complete=lambda p: "nope", num_retries=2)
        with pytest.raises(ValueError):
            asyncio.run(gen.generate("⊢ x", "f.lean", "thm", Pos(1, 1), 4))


class TestShippedConfigs:
    @pytest.mark.parametrize(
        "name,cls_path",
        [
            ("retrieval_lean4_random.yaml", "retrieval"),
            ("retrieval_lean4_novel_premises.yaml", "retrieval"),
            ("retrieval_dummy.yaml", "retrieval"),
            ("generation_lean4_random.yaml", "generation"),
            ("generation_lean4_novel_premises.yaml", "generation"),
        ],
    )
    def test_configs_parse(self, name, cls_path):
        from reprover_tpu.utils.config import parse_config

        if cls_path == "retrieval":
            from reprover_tpu.retrieval.main import LINKS, RetrievalConfig as Cfg

            links = LINKS
        else:
            from reprover_tpu.generation.main import GenerationConfig as Cfg

            links = None
        path = os.path.join(REPO_ROOT, "confs", name)
        sub, cfg = parse_config(Cfg, ["fit", "--config", path], links=links)
        assert sub == "fit"
        assert cfg.seed == 3407
        assert dataclasses.is_dataclass(cfg)

    def test_reference_hparams(self):
        """Spot-check parity-critical hyperparameters."""
        from reprover_tpu.retrieval.main import LINKS, RetrievalConfig
        from reprover_tpu.utils.config import parse_config

        _, cfg = parse_config(
            RetrievalConfig,
            ["--config", os.path.join(REPO_ROOT, "confs", "retrieval_lean4_random.yaml")],
            links=LINKS,
        )
        assert cfg.model.lr == pytest.approx(1e-4)
        assert cfg.model.warmup_steps == 2000
        assert cfg.data.num_negatives == 3
        assert cfg.data.num_in_file_negatives == 1
        assert cfg.data.max_seq_len == 1024
        assert cfg.model.max_seq_len == 1024  # linked
        assert cfg.trainer.max_steps == 800000
        assert cfg.trainer.monitor == "Recall@10_val"
        assert cfg.trainer.patience == 5
