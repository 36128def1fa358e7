"""Retrieval CLI: fit / validate / predict.

Role parity with `/root/reference/retrieval/main.py` (LightningCLI) using
the framework's config system. Examples::

    python -m reprover_tpu.retrieval.main fit --config conf.yaml \
        --trainer.max_steps 1000
    python -m reprover_tpu.retrieval.main predict --config conf.yaml \
        --ckpt_dir runs/exp1/ckpts --preds_out predictions.pickle

The field link data.max_seq_len -> model.max_seq_len mirrors
`retrieval/main.py:13-15`.
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
    lr: float = 1e-4
    warmup_steps: int = 2000
    max_seq_len: int = 1024  # linked from data
    num_retrieved: int = 100
    random_init: bool = False  # skip HF weights (tests/smoke)
    tiny: bool = False  # tiny geometry smoke model (cli_dummy.yaml analog)
    # lax.approx_max_k queries (recall 0.99, +42% QPS at 131k premises —
    # BASELINE.md); default off for exact argsort rank parity.
    approx: bool = False
    # Activation checkpointing (the reference cpu_checkpointing role,
    # default ON: byt5-small training at the reference batch size needs
    # ~60GB of activations without it - fine on an 80GB A100, fatal on a
    # 16GB v5e; remat trades ~30% recompute for 5x memory),
    # `retrieval/model.py:96-99`): rematerialize each layer in backward.
    remat: bool = True
    # Remat flavor: "full" (recompute everything), "lite" (save fat
    # intermediates in HBM, recompute only cheap ops), or "offload" (stream
    # the fat intermediates to pinned host memory — the reference's
    # `cpu_checkpointing` knob itself, `retrieval/model.py:96-99`).
    remat_policy: str = "full"
    # Adam moments in TPU host memory, streamed per update (the reference's
    # DeepSpeedCPUAdam role, `common.py:387-393`): frees ~2x params of HBM
    # for bigger batches on 16GB chips.
    offload_optimizer: bool = False
    # Training objective: "mse" = the reference's in-batch-negative MSE
    # (`retrieval/model.py:116-140`, parity default); "infonce" =
    # multi-positive contrastive (beyond parity; much faster from scratch).
    loss: str = "mse"


@dataclasses.dataclass
class DataConfig:
    data_path: str = ""
    corpus_path: str = ""
    num_negatives: int = 3
    num_in_file_negatives: int = 1
    batch_size: int = 8
    eval_batch_size: int = 64
    max_seq_len: int = 1024
    # Reference-exact negative sampling (errors on scarce out-of-file pools
    # instead of back-filling) for strict-parity runs.
    strict_negatives: bool = False


@dataclasses.dataclass
class RetrievalConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    seed: int = 3407
    log_dir: Optional[str] = None
    ckpt_dir: Optional[str] = None  # restore-from for validate/predict
    preds_out: str = "predictions.pickle"
    data_parallel: bool = True


LINKS = [("data.max_seq_len", "model.max_seq_len")]


def _build(cfg: RetrievalConfig) -> Tuple[Any, ...]:
    from reprover_tpu.models import init_params, load_hf_t5
    from reprover_tpu.models.t5 import byt5_small
    from reprover_tpu.parallel import make_mesh
    from reprover_tpu.retrieval.datamodule import RetrievalDataModule
    from reprover_tpu.retrieval.retriever import PremiseRetriever

    import jax.numpy as jnp

    dm = RetrievalDataModule(
        data_path=cfg.data.data_path,
        corpus_path=cfg.data.corpus_path,
        num_negatives=cfg.data.num_negatives,
        num_in_file_negatives=cfg.data.num_in_file_negatives,
        batch_size=cfg.data.batch_size,
        eval_batch_size=cfg.data.eval_batch_size,
        max_seq_len=cfg.data.max_seq_len,
        seed=cfg.seed,
        strict_negatives=cfg.data.strict_negatives,
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
        params, model_cfg = load_hf_t5(
            cfg.model.model_name, encoder_only=True, compute_dtype=dtype
        )
    if cfg.model.remat:
        model_cfg = dataclasses.replace(
            model_cfg, remat=True, remat_policy=cfg.model.remat_policy
        )
    if on_tpu and not (cfg.data_parallel and len(jax.devices()) > 1):
        # Pallas flash encoder with custom-VJP backward: on for training
        # too. Single-device only: a pallas_call is not SPMD-partitionable,
        # so under a mesh the naive (GSPMD-partitioned) path stays.
        model_cfg = dataclasses.replace(model_cfg, flash_encoder=True)
    # Fused gate|up MLP layout: one wide matmul per layer (+8% measured);
    # checkpoints store this layout, HF export splits it back.
    from reprover_tpu.models.t5 import fuse_mlp_params

    params = fuse_mlp_params(params)
    mesh = None
    if cfg.data_parallel and len(jax.devices()) > 1:
        # The data axis must divide the train batch size.
        import math

        data = math.gcd(cfg.data.batch_size, len(jax.devices()))
        mesh = make_mesh(data=data) if data > 1 else None
    retriever = PremiseRetriever(
        params,
        model_cfg,
        max_seq_len=cfg.model.max_seq_len,
        num_retrieved=cfg.model.num_retrieved,
        mesh=mesh,
        approximate=cfg.model.approx,
    )
    retriever.load_corpus(dm.corpus)
    return dm, retriever, model_cfg, mesh


def run_fit(cfg: RetrievalConfig) -> None:
    from reprover_tpu.retrieval.prediction import validation_metrics
    from reprover_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
        retrieval_infonce_loss,
        retrieval_loss,
    )
    from reprover_tpu.utils import make_writer

    dm, retriever, model_cfg, mesh = _build(cfg)
    dm.setup("fit")
    tx = make_optimizer(cfg.model.lr, cfg.model.warmup_steps)
    state = init_train_state(retriever.params, tx)
    if cfg.model.offload_optimizer:
        from reprover_tpu.training import offload_opt_state

        state = offload_opt_state(state, mesh)
    assert cfg.model.loss in ("mse", "infonce"), cfg.model.loss
    loss_fn = retrieval_loss if cfg.model.loss == "mse" else retrieval_infonce_loss
    step_fn = make_train_step(
        loss_fn,
        model_cfg,
        tx,
        mesh=mesh,
        offload_opt=cfg.model.offload_optimizer,
    )
    writer = make_writer(cfg.log_dir, stdout_every=cfg.trainer.log_interval)
    writer.write_hparams(config_to_dict(cfg))

    def validate(train_state, step):
        retriever.params = train_state.params
        retriever.mark_stale()
        return validation_metrics(
            retriever, dm.val_dataloader(), cfg.model.num_retrieved
        )

    trainer = Trainer(
        cfg.trainer,
        step_fn,
        writer,
        validate_fn=validate,
        on_train_batch_end=retriever.mark_stale,
    )
    trainer.fit(state, dm.train_dataloader())
    writer.close()


def _restore_params(cfg: RetrievalConfig, retriever: Any) -> None:
    if cfg.ckpt_dir:
        from reprover_tpu.training import init_train_state, make_optimizer
        from reprover_tpu.utils import CheckpointManager

        tx = make_optimizer(cfg.model.lr, cfg.model.warmup_steps)
        state = init_train_state(retriever.params, tx)
        mgr = CheckpointManager(cfg.ckpt_dir)
        retriever.params = mgr.restore(state).params
        retriever.mark_stale()


def run_validate(cfg: RetrievalConfig) -> None:
    from reprover_tpu.retrieval.prediction import validation_metrics

    dm, retriever, _, _ = _build(cfg)
    dm.setup("validate")
    _restore_params(cfg, retriever)
    metrics = validation_metrics(
        retriever, dm.val_dataloader(), cfg.model.num_retrieved
    )
    for k in ("Recall@1_val", "Recall@10_val", "MRR"):
        print(f"{k}: {metrics.get(k)}")


def run_predict(cfg: RetrievalConfig) -> None:
    from reprover_tpu.retrieval.prediction import predict, save_predictions

    dm, retriever, _, _ = _build(cfg)
    dm.setup("predict")
    _restore_params(cfg, retriever)
    outputs = predict(
        retriever, dm.predict_dataloader(), cfg.model.num_retrieved
    )
    out = (
        os.path.join(cfg.log_dir, cfg.preds_out) if cfg.log_dir else cfg.preds_out
    )
    save_predictions(outputs, out)


def main(argv: Optional[List[str]] = None) -> None:
    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)
    subcommand, cfg = parse_config(
        RetrievalConfig, argv if argv is not None else sys.argv[1:], links=LINKS
    )
    np.random.seed(cfg.seed)
    if subcommand == "fit":
        run_fit(cfg)
    elif subcommand == "validate":
        run_validate(cfg)
    elif subcommand == "predict":
        run_predict(cfg)
    else:
        raise SystemExit(f"unknown subcommand {subcommand!r} (fit|validate|predict)")


if __name__ == "__main__":
    main()
