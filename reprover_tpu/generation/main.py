"""Generation CLI: fit / validate.

Role parity with `/root/reference/generation/main.py` (LightningCLI over
``RetrievalAugmentedGenerator`` + ``GeneratorDataModule``). Optional
end-to-end Pass@1 validation (`generation/model.py:212-262`) is wired when
``trainer_eval.num_theorems > 0`` and LeanDojo (or a fake environment in
tests) is available.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
from typing import Any, List, Optional, Tuple

import jax
import numpy as np

from reprover_tpu.training.loop import Trainer, TrainerConfig
from reprover_tpu.utils.config import config_to_dict, parse_config

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ModelConfig:
    model_name: str = "google/byt5-small"
    lr: float = 5e-4
    warmup_steps: int = 2000
    num_beams: int = 1  # beams for validation Top-k accuracy
    length_penalty: float = 0.0
    ret_ckpt_path: Optional[str] = None  # frozen retriever (HF dir)
    random_init: bool = False
    tiny: bool = False  # tiny geometry smoke model
    # Activation checkpointing, default ON: byt5-small at the reference
    # batch size needs ~60GB of activations without it — fine on an 80GB
    # A100, fatal on a 16GB v5e.
    remat: bool = True
    # Remat flavor: "full" / "lite" / "offload" — see retrieval CLI;
    # "offload" is the reference's DeepSpeed `cpu_checkpointing`.
    remat_policy: str = "full"
    # Adam moments in TPU host memory, streamed per update (the reference's
    # DeepSpeedCPUAdam role, `common.py:387-393`).
    offload_optimizer: bool = False


@dataclasses.dataclass
class DataConfig:
    data_path: str = ""
    corpus_path: Optional[str] = None
    preds_path: Optional[str] = None  # retriever predictions.pickle
    batch_size: int = 8
    eval_batch_size: int = 64
    max_inp_seq_len: int = 2300
    max_oup_seq_len: int = 512
    p_drop: float = 0.5


@dataclasses.dataclass
class EndToEndEvalConfig:
    """In-training prover eval (`generation/model.py:212-262`)."""

    num_theorems: int = 0  # 0 disables
    num_workers: int = 5
    timeout: int = 600
    num_sampled_tactics: int = 64


@dataclasses.dataclass
class GenerationConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    eval: EndToEndEvalConfig = dataclasses.field(default_factory=EndToEndEvalConfig)
    seed: int = 3407
    log_dir: Optional[str] = None
    ckpt_dir: Optional[str] = None
    limit_val_batches: Optional[int] = None
    data_parallel: bool = True


def _build(cfg: GenerationConfig) -> Tuple[Any, ...]:
    import jax.numpy as jnp

    from reprover_tpu.generation.datamodule import GeneratorDataModule
    from reprover_tpu.generation.generator import TacticGeneratorModel
    from reprover_tpu.models import init_params, load_hf_t5
    from reprover_tpu.models.t5 import byt5_small
    from reprover_tpu.parallel import make_mesh

    dm = GeneratorDataModule(
        data_path=cfg.data.data_path,
        batch_size=cfg.data.batch_size,
        eval_batch_size=cfg.data.eval_batch_size,
        max_inp_seq_len=cfg.data.max_inp_seq_len,
        max_oup_seq_len=cfg.data.max_oup_seq_len,
        p_drop=cfg.data.p_drop,
        corpus_path=cfg.data.corpus_path,
        preds_path=cfg.data.preds_path,
        seed=cfg.seed,
    )
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if cfg.model.tiny:
        from reprover_tpu.models.t5 import T5Config

        model_cfg = T5Config(
            d_model=32,
            d_kv=8,
            d_ff=64,
            num_heads=4,
            num_encoder_layers=2,
            num_decoder_layers=1,
            compute_dtype=dtype,
        )
        params = init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    elif cfg.model.random_init:
        model_cfg = byt5_small(compute_dtype=dtype)
        params = init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    else:
        params, model_cfg = load_hf_t5(cfg.model.model_name, compute_dtype=dtype)
    if cfg.model.remat:
        model_cfg = dataclasses.replace(
            model_cfg, remat=True, remat_policy=cfg.model.remat_policy
        )
    if on_tpu and not (cfg.data_parallel and len(jax.devices()) > 1):
        # Pallas flash attention has custom-VJP backwards throughout, so
        # training uses it for the encoder AND the teacher-forced decoder
        # (causal self + cross) — the 2300-byte reference input pads to
        # 2304 and out 512 is already 128-aligned, so both are eligible.
        # Single-device only: a pallas_call is not SPMD-partitionable,
        # so under a mesh the naive (GSPMD-partitioned) path stays.
        model_cfg = dataclasses.replace(
            model_cfg, flash_encoder=True, flash_decoder=True
        )
    # Fused gate|up MLP layout (+8% measured); HF export splits it back.
    from reprover_tpu.models.t5 import fuse_mlp_params

    params = fuse_mlp_params(params)
    model = TacticGeneratorModel(
        params,
        model_cfg,
        cfg.data.max_inp_seq_len,
        cfg.data.max_oup_seq_len,
        cfg.model.length_penalty,
    )
    mesh = None
    if cfg.data_parallel and len(jax.devices()) > 1:
        import math

        data = math.gcd(cfg.data.batch_size, len(jax.devices()))
        mesh = make_mesh(data=data) if data > 1 else None
    return dm, model, model_cfg, mesh


def _end_to_end_pass1(
    cfg: GenerationConfig, model: Any, environment: Any = None, retriever: Any = None
) -> float:
    """Run the prover on ``eval.num_theorems`` theorems with the current
    weights; returns Pass@1 (`generation/model.py:227-254`).

    With ``eval.num_workers > 1``, Lean interaction runs in worker processes
    while this process keeps the device and serves all searches through one
    continuous-batching :class:`InferenceService` (retrieval-augmented when a
    frozen retriever is configured)."""
    from reprover_tpu.prover import evaluate
    from reprover_tpu.prover.tactic_generator import (
        FixedTacticGenerator,
        LocalTacticGenerator,
        RetrievalAugmentedTacticGenerator,
    )

    if environment is None:
        from reprover_tpu.prover.environment import (
            LeanDojoEnvironment,
            lean_dojo_available,
        )

        if not lean_dojo_available():
            logger.warning("lean_dojo unavailable; skipping end-to-end eval")
            return float("nan")
        environment = LeanDojoEnvironment(cfg.eval.timeout)

    common = dict(
        split="val",
        num_theorems=cfg.eval.num_theorems,
        num_sampled_tactics=cfg.eval.num_sampled_tactics,
        timeout=cfg.eval.timeout,
    )
    if cfg.eval.num_workers > 1:
        from reprover_tpu.prover import InferenceService

        service = InferenceService(model, retriever=retriever)
        service.start()
        try:
            return evaluate(
                cfg.data.data_path,
                environment,
                FixedTacticGenerator("unused"),  # replaced per worker
                num_workers=cfg.eval.num_workers,
                make_client=service.client,
                **common,
            )
        finally:
            service.stop()

    tac_gen = LocalTacticGenerator(model)
    if retriever is not None:
        tac_gen = RetrievalAugmentedTacticGenerator(tac_gen, retriever)
    return evaluate(
        cfg.data.data_path, environment, tac_gen, num_workers=1, **common
    )


def run_fit(cfg: GenerationConfig, environment: Any = None) -> None:
    from reprover_tpu.generation.validate import validation_metrics
    from reprover_tpu.training import (
        generation_loss,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from reprover_tpu.utils import make_writer

    dm, model, model_cfg, mesh = _build(cfg)
    dm.setup("fit")
    tx = make_optimizer(cfg.model.lr, cfg.model.warmup_steps)
    state = init_train_state(model.params, tx)
    if cfg.model.offload_optimizer:
        from reprover_tpu.training import offload_opt_state

        state = offload_opt_state(state, mesh)
    step_fn = make_train_step(
        generation_loss,
        model_cfg,
        tx,
        mesh=mesh,
        offload_opt=cfg.model.offload_optimizer,
    )
    writer = make_writer(cfg.log_dir, stdout_every=cfg.trainer.log_interval)
    writer.write_hparams(config_to_dict(cfg))

    # Frozen retriever for retrieval-augmented end-to-end eval
    # (`generation/model.py:78-84`).
    retriever = None
    if cfg.model.ret_ckpt_path and cfg.data.corpus_path:
        from reprover_tpu.retrieval import PremiseRetriever

        retriever = PremiseRetriever.load_hf(
            cfg.model.ret_ckpt_path, cfg.data.max_inp_seq_len
        )
        retriever.load_corpus(cfg.data.corpus_path)

    def validate(train_state, step):
        model.params = train_state.params
        metrics = validation_metrics(
            model,
            dm.val_dataloader(),
            num_beams=cfg.model.num_beams,
            limit_batches=cfg.limit_val_batches,
            writer=writer,
            step=step,
        )
        if cfg.eval.num_theorems > 0:
            metrics["Pass@1_val"] = _end_to_end_pass1(
                cfg, model, environment, retriever
            )
        return metrics

    trainer = Trainer(cfg.trainer, step_fn, writer, validate_fn=validate)
    trainer.fit(state, dm.train_dataloader())
    writer.close()


def run_validate(cfg: GenerationConfig, environment: Any = None) -> None:
    from reprover_tpu.generation.validate import validation_metrics
    from reprover_tpu.utils import CheckpointManager

    dm, model, _, _ = _build(cfg)
    dm.setup("validate")
    if cfg.ckpt_dir:
        from reprover_tpu.training import init_train_state, make_optimizer

        tx = make_optimizer(cfg.model.lr, cfg.model.warmup_steps)
        state = init_train_state(model.params, tx)
        model.params = CheckpointManager(cfg.ckpt_dir).restore(state).params
    metrics = validation_metrics(
        model,
        dm.val_dataloader(),
        num_beams=cfg.model.num_beams,
        limit_batches=cfg.limit_val_batches,
    )
    for k, v in metrics.items():
        print(f"{k}: {v}")


def main(argv: Optional[List[str]] = None) -> None:
    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)
    subcommand, cfg = parse_config(
        GenerationConfig, argv if argv is not None else sys.argv[1:]
    )
    np.random.seed(cfg.seed)
    if subcommand == "fit":
        run_fit(cfg)
    elif subcommand == "validate":
        run_validate(cfg)
    else:
        raise SystemExit(f"unknown subcommand {subcommand!r} (fit|validate)")


if __name__ == "__main__":
    main()
