"""Config system, Trainer loop (ckpt + early stop), and CLI smoke runs
(the reference's cli_dummy.yaml 1-step smoke, SURVEY.md §4)."""

import dataclasses
import json
import os
import pickle
from typing import Optional

import numpy as np
import pytest

from reprover_tpu.utils.config import parse_config


# ------------------------------------------------------------------ #
# Config system
# ------------------------------------------------------------------ #


@dataclasses.dataclass
class _Inner:
    lr: float = 1e-4
    steps: int = 10
    name: str = "x"
    maybe: Optional[str] = None
    flag: bool = False


@dataclasses.dataclass
class _Outer:
    model: _Inner = dataclasses.field(default_factory=_Inner)
    data: _Inner = dataclasses.field(default_factory=_Inner)
    seed: int = 1


class TestConfig:
    def test_defaults_and_overrides(self):
        sub, cfg = parse_config(
            _Outer, ["fit", "--model.lr", "3e-5", "--seed", "7", "--model.flag", "true"]
        )
        assert sub == "fit"
        assert cfg.model.lr == pytest.approx(3e-5)
        assert cfg.seed == 7
        assert cfg.model.flag is True
        assert cfg.data.lr == pytest.approx(1e-4)

    def test_yaml_plus_cli(self, tmp_path):
        conf = tmp_path / "c.yaml"
        conf.write_text("model:\n  lr: 0.5\n  steps: 99\nseed: 3\n")
        _, cfg = parse_config(
            _Outer, ["--config", str(conf), "--model.steps", "5"]
        )
        assert cfg.model.lr == 0.5
        assert cfg.model.steps == 5  # CLI wins
        assert cfg.seed == 3

    def test_links(self):
        _, cfg = parse_config(
            _Outer,
            ["--data.steps", "42"],
            links=[("data.steps", "model.steps")],
        )
        assert cfg.model.steps == 42

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config key"):
            parse_config(_Outer, ["--model.nope", "1"])

    def test_optional_none(self):
        _, cfg = parse_config(_Outer, ["--model.maybe", "null"])
        assert cfg.model.maybe is None
        _, cfg = parse_config(_Outer, ["--model.maybe", "hello"])
        assert cfg.model.maybe == "hello"

    def test_equals_syntax(self):
        _, cfg = parse_config(_Outer, ["--model.lr=0.25"])
        assert cfg.model.lr == 0.25

    def test_custom_default_factory_survives_partial_override(self):
        # Regression: a parent customizing a sub-config via default_factory
        # must keep those customizations when the CLI overrides only SOME
        # of the sub-config's fields. The round-4 flagship pretrain lost
        # 21k steps to this: --trainer.max_steps reset monitor back to the
        # class default, and every time-limited checkpoint save then
        # crashed with KeyError('Recall@10_val').
        @dataclasses.dataclass
        class _Custom:
            model: _Inner = dataclasses.field(
                default_factory=lambda: _Inner(name="loss_val", lr=0.5)
            )

        _, cfg = parse_config(_Custom, ["--model.steps", "7"])
        assert cfg.model.steps == 7
        assert cfg.model.name == "loss_val"  # customized default preserved
        assert cfg.model.lr == 0.5

    def test_pretrain_trainer_monitor_survives_cli_overrides(self):
        # The exact production shape of the regression above.
        from reprover_tpu.training.pretrain import PretrainConfig

        _, cfg = parse_config(
            PretrainConfig,
            ["fit", "--trainer.max_steps", "70000",
             "--trainer.time_limit_s", "5403", "--trainer.resume", "true"],
        )
        assert cfg.trainer.monitor == "loss_val"
        assert cfg.trainer.monitor_mode == "min"
        assert cfg.trainer.max_steps == 70000


# ------------------------------------------------------------------ #
# Trainer: fit + checkpoint + early stopping on a synthetic task
# ------------------------------------------------------------------ #


class TestTrainer:
    def _make(self, tmp_path, patience=2, max_steps=50, metric_seq=None):
        import jax.numpy as jnp

        from reprover_tpu.training.loop import Trainer, TrainerConfig
        from reprover_tpu.training.tasks import TrainState
        from reprover_tpu.utils.metrics import MetricWriter

        class Recorder(MetricWriter):
            def __init__(self):
                self.records = []

            def write(self, step, scalars):
                self.records.append((step, dict(scalars)))

        # Synthetic "train step": params is one scalar, loss decreases.
        def step_fn(state, batch):
            new_params = {"w": state.params["w"] * 0.9}
            return (
                TrainState(state.step + 1, new_params, state.opt_state),
                jnp.asarray(float(np.abs(np.asarray(new_params["w"])).sum())),
            )

        seq = iter(metric_seq or [])

        def validate(state, step):
            return {"metric": next(seq, 0.0)}

        writer = Recorder()
        trainer = Trainer(
            TrainerConfig(
                max_steps=max_steps,
                val_interval=5,
                log_interval=5,
                monitor="metric",
                monitor_mode="max",
                patience=patience,
                ckpt_dir=str(tmp_path / "ckpts"),
            ),
            step_fn,
            writer,
            validate_fn=validate,
        )
        state = TrainState(
            jnp.zeros((), jnp.int32), {"w": jnp.ones((4,))}, {"dummy": jnp.zeros(())}
        )
        loader = [{"x": np.zeros((2, 2), np.float32)}] * 100
        return trainer, state, loader, writer

    def test_runs_to_max_steps(self, tmp_path):
        trainer, state, loader, writer = self._make(
            tmp_path, patience=99, max_steps=12, metric_seq=[1, 2, 3, 4, 5]
        )
        final = trainer.fit(state, loader)
        assert int(np.asarray(final.step)) == 12

    def test_early_stopping(self, tmp_path):
        # metric improves once then plateaus -> stop after patience=2 checks
        trainer, state, loader, writer = self._make(
            tmp_path, patience=2, max_steps=1000, metric_seq=[5, 5, 5, 5, 5, 5]
        )
        final = trainer.fit(state, loader)
        # val at steps 5,10,15: improvement at 5, flat at 10 and 15 -> stop
        assert int(np.asarray(final.step)) == 15

    def test_time_limit_stops_gracefully(self, tmp_path):
        # time_limit_s=0 crosses the budget after the first step; fit must
        # stop there AND still run the final validation + checkpoint save
        # (the graceful half that an external `timeout` kill would drop).
        trainer, state, loader, writer = self._make(
            tmp_path, patience=99, max_steps=1000, metric_seq=[1, 2, 3]
        )
        trainer.config.time_limit_s = 0.0
        final = trainer.fit(state, loader)
        assert int(np.asarray(final.step)) == 1
        assert trainer.ckpt is not None and trainer.ckpt.latest_step() == 1

    def test_saves_when_monitor_key_absent(self, tmp_path):
        # A task validating a DIFFERENT metric than the configured monitor
        # (e.g. pretraining's loss_val under a Recall@10_val monitor) must
        # still persist periodic + final checkpoints — the manager keeps
        # them as latest; best-tracking simply never engages. Regression
        # for the round-4 KeyError that dropped a 21k-step pretrain save.
        trainer, state, loader, writer = self._make(
            tmp_path, patience=99, max_steps=12, metric_seq=[1, 2, 3]
        )
        trainer.config.monitor = "not_a_metric_we_emit"
        final = trainer.fit(state, loader)
        assert int(np.asarray(final.step)) == 12
        assert trainer.ckpt is not None
        assert trainer.ckpt.latest_step() == 12
        # periodic saves (val_interval=5) committed too, not just the final
        from reprover_tpu.utils import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "ckpts"))
        assert mgr.latest_step() == 12

    def test_checkpoint_restore(self, tmp_path):
        trainer, state, loader, writer = self._make(
            tmp_path, patience=99, max_steps=10, metric_seq=[1, 2]
        )
        final = trainer.fit(state, loader)
        from reprover_tpu.utils import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "ckpts"))
        import jax.numpy as jnp

        from reprover_tpu.training.tasks import TrainState

        template = TrainState(
            jnp.zeros((), jnp.int32), {"w": jnp.ones((4,))}, {"dummy": jnp.zeros(())}
        )
        restored = mgr.restore(template)
        np.testing.assert_allclose(
            np.asarray(restored.params["w"]), np.asarray(final.params["w"])
        )


# ------------------------------------------------------------------ #
# CLI smoke: 1-step retrieval + generation fits on the toy dataset
# ------------------------------------------------------------------ #


@pytest.mark.slow
class TestCliSmoke:
    def test_retrieval_fit_validate_predict(
        self, toy_corpus_path, toy_dataset_dir, tmp_path
    ):
        from reprover_tpu.retrieval.main import main

        log_dir = str(tmp_path / "logs")
        common = [
            "--model.tiny", "true",
            "--model.num_retrieved", "4",
            "--data.data_path", toy_dataset_dir,
            "--data.corpus_path", toy_corpus_path,
            "--data.batch_size", "2",
            "--data.eval_batch_size", "2",
            "--data.max_seq_len", "256",
            "--data.num_negatives", "2",
            "--data.num_in_file_negatives", "1",
            "--trainer.max_steps", "2",
            "--trainer.val_interval", "2",
            "--trainer.log_interval", "1",
            "--trainer.patience", "99",
            "--log_dir", log_dir,
        ]
        main(["fit"] + common + ["--trainer.ckpt_dir", str(tmp_path / "ck")])
        assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
        with open(os.path.join(log_dir, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert any("Recall@4_val" in r for r in recs)
        assert any("loss" in r for r in recs)

        main(["predict"] + common + ["--preds_out", "p.pickle"])
        with open(os.path.join(log_dir, "p.pickle"), "rb") as f:
            preds = pickle.load(f)
        assert len(preds) == 9  # 3 splits x 3 tactics

    def test_retrieval_fit_offload_remat(
        self, toy_corpus_path, toy_dataset_dir, tmp_path
    ):
        """--model.remat_policy offload (activations streamed to pinned host
        memory — the reference cpu_checkpointing knob,
        /root/reference/retrieval/model.py:96-99) trains through the CLI.
        Single-device (--data_parallel false): the offload policy is
        per-device by design — make_train_step rejects it under a mesh."""
        from reprover_tpu.retrieval.main import main

        log_dir = str(tmp_path / "logs")
        main([
            "fit",
            "--model.tiny", "true",
            "--model.remat", "true",
            "--model.remat_policy", "offload",
            "--data_parallel", "false",
            "--model.num_retrieved", "4",
            "--data.data_path", toy_dataset_dir,
            "--data.corpus_path", toy_corpus_path,
            "--data.batch_size", "2",
            "--data.eval_batch_size", "2",
            "--data.max_seq_len", "256",
            "--data.num_negatives", "2",
            "--data.num_in_file_negatives", "1",
            "--trainer.max_steps", "2",
            "--trainer.val_interval", "99",
            "--trainer.log_interval", "1",
            "--log_dir", log_dir,
        ])
        with open(os.path.join(log_dir, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)

    def test_retrieval_fit_infonce(
        self, toy_corpus_path, toy_dataset_dir, tmp_path
    ):
        """--model.loss infonce trains through the same CLI path."""
        from reprover_tpu.retrieval.main import main

        log_dir = str(tmp_path / "logs")
        main([
            "fit",
            "--model.tiny", "true",
            "--model.loss", "infonce",
            "--model.num_retrieved", "4",
            "--data.data_path", toy_dataset_dir,
            "--data.corpus_path", toy_corpus_path,
            "--data.batch_size", "2",
            "--data.eval_batch_size", "2",
            "--data.max_seq_len", "256",
            "--data.num_negatives", "2",
            "--data.num_in_file_negatives", "1",
            "--trainer.max_steps", "2",
            "--trainer.val_interval", "99",
            "--trainer.log_interval", "1",
            "--log_dir", log_dir,
        ])
        with open(os.path.join(log_dir, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)

    def test_generation_fit(self, toy_dataset_dir, tmp_path):
        from reprover_tpu.generation.main import main

        log_dir = str(tmp_path / "glogs")
        main(
            [
                "fit",
                "--model.tiny", "true",
                "--model.num_beams", "2",
                "--data.data_path", toy_dataset_dir,
                "--data.batch_size", "2",
                "--data.eval_batch_size", "2",
                "--data.max_inp_seq_len", "256",
                "--data.max_oup_seq_len", "64",
                "--trainer.max_steps", "2",
                "--trainer.val_interval", "2",
                "--trainer.log_interval", "1",
                "--trainer.monitor", "loss_val",
                "--trainer.monitor_mode", "min",
                "--trainer.patience", "99",
                "--log_dir", log_dir,
            ]
        )
        with open(os.path.join(log_dir, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert any("loss_val" in r for r in recs)
        assert any("top2_acc_val" in r for r in recs)


class TestResumeAndBest:
    def test_trainer_resume_continues_from_checkpoint(self, tmp_path):
        import jax.numpy as jnp

        from reprover_tpu.training.loop import Trainer, TrainerConfig
        from reprover_tpu.training.tasks import TrainState
        from reprover_tpu.utils.metrics import MetricWriter

        class Null(MetricWriter):
            def write(self, step, scalars):
                pass

        def step_fn(state, batch):
            return (
                TrainState(state.step + 1, state.params, state.opt_state),
                jnp.asarray(0.5),
            )

        def validate(state, step):
            return {"metric": float(step)}

        def make_trainer(max_steps, resume):
            return Trainer(
                TrainerConfig(
                    max_steps=max_steps,
                    val_interval=5,
                    monitor="metric",
                    patience=99,
                    ckpt_dir=str(tmp_path / "ck"),
                    resume=resume,
                ),
                step_fn,
                Null(),
                validate_fn=validate,
            )

        def fresh_state():
            return TrainState(
                jnp.zeros((), jnp.int32), {"w": jnp.ones((4,))}, {"o": jnp.zeros(())}
            )

        loader = [{"x": np.zeros((1,), np.float32)}] * 100
        final = make_trainer(10, resume=False).fit(fresh_state(), loader)
        assert int(np.asarray(final.step)) == 10

        # Second run resumes at step 10 and continues to 20 (not restarting).
        final2 = make_trainer(20, resume=True).fit(fresh_state(), loader)
        assert int(np.asarray(final2.step)) == 20

    def test_checkpoint_manager_best_step(self, tmp_path):
        import jax.numpy as jnp

        from reprover_tpu.training.tasks import TrainState
        from reprover_tpu.utils import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "b"), monitor="m", mode="max")
        s = TrainState(jnp.zeros((), jnp.int32), {"w": jnp.ones(2)}, {})
        mgr.save(1, s, {"m": 0.1})
        mgr.save(2, s, {"m": 0.9})
        mgr.save(3, s, {"m": 0.4})
        mgr.wait()
        assert mgr.best_step() == 2
        assert mgr.latest_step() == 3
        mgr.close()


class TestTextTables:
    def test_jsonl_write_text(self, tmp_path):
        import json

        from reprover_tpu.utils.metrics import JsonlWriter

        path = str(tmp_path / "m.jsonl")
        w = JsonlWriter(path)
        rows = [{"state": "⊢ True", "ground_truth": "trivial", "prediction": "rfl"}]
        w.write_text(7, "val_samples", rows)
        w.close()
        rec = json.loads(open(path).read().strip())
        assert rec == {"step": 7, "text_table": "val_samples", "rows": rows}

    def test_generation_validate_emits_samples(self):
        """validation_metrics logs (state, ground truth, prediction) rows —
        the reference's WandB tables (`generation/model.py:139-155`)."""
        import jax
        import jax.numpy as jnp

        from reprover_tpu.generation.generator import TacticGeneratorModel
        from reprover_tpu.generation.validate import validation_metrics
        from reprover_tpu.models import init_params
        from reprover_tpu.models.t5 import T5Config
        from reprover_tpu.tokenizer import ByT5Tokenizer
        from reprover_tpu.utils.metrics import MetricWriter

        cfg = T5Config(
            d_model=32, d_kv=8, d_ff=64, num_heads=4,
            num_encoder_layers=2, num_decoder_layers=1,
        )
        model = TacticGeneratorModel(
            init_params(jax.random.PRNGKey(0), cfg), cfg,
            max_inp_seq_len=64, max_oup_seq_len=8,
        )
        tok = ByT5Tokenizer()
        states = ["⊢ True", "⊢ 1 = 1"]
        tactics = ["trivial", "rfl"]
        b = tok(states, max_length=64, bucket_multiple=32)
        t = tok(tactics, max_length=8, bucket_multiple=8)
        labels = np.where(t.attention_mask == 1, t.input_ids, -100)
        batch = {
            "state": states, "tactic": tactics,
            "state_ids": b.input_ids, "state_mask": b.attention_mask,
            "tactic_ids": labels,
        }

        class Recorder(MetricWriter):
            def __init__(self):
                self.tables = []

            def write(self, step, scalars):
                pass

            def write_text(self, step, key, rows):
                self.tables.append((step, key, rows))

        rec = Recorder()
        metrics = validation_metrics(
            model, [batch], num_beams=2, writer=rec, step=5
        )
        assert "top1_acc_val" in metrics
        (step, key, rows), = rec.tables
        assert step == 5 and key == "val_samples"
        assert [r["state"] for r in rows] == states
        assert all({"state", "ground_truth", "prediction"} <= set(r) for r in rows)


class TestTrainingHealth:
    """DivergenceGuard + embedding effective rank (training/health.py) —
    the round-4 warmup-peak-divergence lesson turned into product code."""

    def test_guard_flags_the_measured_r4_curve_shape(self):
        from reprover_tpu.training.health import DivergenceError, DivergenceGuard

        # r4_pretrain_byt5.err shape: descend to ~1.23, climb past 1.9
        losses = [1.86, 1.64, 1.44, 1.29, 1.28, 1.25, 1.23, 1.35, 1.38,
                  1.58, 1.63, 1.87, 1.90, 1.91, 1.95, 1.86, 1.85, 1.98, 2.12,
                  2.05, 2.11, 2.02]  # r4 log continues ~2.0-2.1
        guard = DivergenceGuard(factor=1.5, patience=5)
        with pytest.raises(DivergenceError, match="diverged"):
            for i, loss in enumerate(losses):
                guard.update(step=50 * (i + 1), loss=loss)

    def test_guard_quiet_on_noisy_flat_and_descending_loss(self):
        from reprover_tpu.training.health import DivergenceGuard

        rng = np.random.default_rng(0)
        guard = DivergenceGuard(factor=1.5, patience=5)
        # descending with 20% multiplicative noise, then a flat noisy tail
        for i in range(200):
            base = max(0.2, 2.0 * (0.98**i))
            guard.update(step=50 * (i + 1), loss=base * rng.uniform(0.8, 1.2))

    def test_guard_raises_immediately_on_nonfinite(self):
        from reprover_tpu.training.health import DivergenceError, DivergenceGuard

        guard = DivergenceGuard()
        with pytest.raises(DivergenceError, match="non-finite"):
            guard.update(step=50, loss=float("nan"))

    def test_eff_rank_separates_collapsed_from_isotropic(self):
        from reprover_tpu.training.health import embedding_eff_rank

        rng = np.random.default_rng(0)
        direction = rng.normal(size=(1, 64))
        collapsed = direction * rng.uniform(0.9, 1.1, size=(32, 1))
        collapsed += 1e-4 * rng.normal(size=(32, 64))
        isotropic = rng.normal(size=(32, 64))
        r_collapsed = embedding_eff_rank(collapsed)
        r_iso = embedding_eff_rank(isotropic)
        assert r_collapsed < 2.0, r_collapsed
        assert r_iso > 16.0, r_iso

    def test_anisotropy_separates_mse_trainable_from_doomed(self):
        """The round-5 discriminator: MSE-trainable inits have off-diag
        cos spread ~0.03 (random byt5/d256); span-corruption checkpoints
        probe ~0.999 mean with std < 0.001 and park at the MSE floor."""
        from reprover_tpu.training.health import embedding_anisotropy

        rng = np.random.default_rng(0)
        # doomed geometry: one dominant shared direction + tiny residual
        shared = rng.normal(size=(1, 64))
        doomed = shared + 0.01 * rng.normal(size=(32, 64))
        # trainable geometry: shared direction + substantial residual
        trainable = shared + 0.45 * rng.normal(size=(32, 64))
        d = embedding_anisotropy(doomed)
        t = embedding_anisotropy(trainable)
        assert d["cos_offdiag_mean"] > 0.99, d
        assert d["cos_offdiag_std"] < 0.005, d
        assert t["cos_offdiag_std"] > 0.01, t
        assert t["cos_offdiag_mean"] < 0.98, t
        # degenerate input doesn't crash the validation loop
        nan = embedding_anisotropy(np.zeros((1, 8)))
        assert np.isnan(nan["cos_offdiag_mean"])

    def test_trainer_aborts_on_divergence(self, tmp_path):
        import jax.numpy as jnp

        from reprover_tpu.training.health import DivergenceError
        from reprover_tpu.training.loop import Trainer, TrainerConfig
        from reprover_tpu.training.tasks import TrainState
        from reprover_tpu.utils.metrics import MetricWriter

        class Recorder(MetricWriter):
            def __init__(self):
                self.records = []

            def write(self, step, scalars):
                self.records.append((step, dict(scalars)))

        # loss descends for 60 steps then blows up (w *= 1.1 past a floor)
        def step_fn(state, batch):
            step = int(np.asarray(state.step))
            factor = 0.9 if step < 60 else 1.15
            new_params = {"w": state.params["w"] * factor}
            return (
                TrainState(state.step + 1, new_params, state.opt_state),
                jnp.asarray(float(np.abs(np.asarray(new_params["w"])).sum())),
            )

        trainer = Trainer(
            TrainerConfig(
                max_steps=10_000, val_interval=10_000, log_interval=5,
                divergence_factor=1.5, divergence_patience=4,
            ),
            step_fn,
            Recorder(),
        )
        state = TrainState(
            jnp.zeros((), jnp.int32), {"w": jnp.ones((4,))},
            {"dummy": jnp.zeros(())},
        )
        loader = [{"x": np.zeros((2, 2), np.float32)}] * 10_000
        with pytest.raises(DivergenceError):
            trainer.fit(state, loader)
