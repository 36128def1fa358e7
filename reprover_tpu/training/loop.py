"""The training loop: fit with periodic validation, checkpointing, early stop.

Replaces the Lightning Trainer + callbacks
(`/root/reference/retrieval/confs/cli_lean4_random.yaml:2-35`):

- donated jit'd train step (from :mod:`reprover_tpu.training.tasks`),
  batches DP-sharded over the mesh;
- validation every ``val_interval`` steps calls a task-supplied callback
  returning a metrics dict (retrieval: reindex + R@k/MRR; generation: loss +
  Topk accuracy + optional end-to-end Pass@1);
- :class:`~reprover_tpu.utils.CheckpointManager` keeps best-by-monitor +
  latest (ModelCheckpoint save_top_k=1 + save_last parity);
- early stopping on the monitored metric with configurable patience
  (EarlyStopping parity, patience 5 retrieval / 2 generation).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np

from reprover_tpu.training.tasks import TrainState, numeric_batch
from reprover_tpu.utils import CheckpointManager, MetricWriter

logger = logging.getLogger(__name__)

ValidateFn = Callable[[TrainState, int], Dict[str, float]]


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 800_000
    val_interval: int = 5_000  # steps between validations
    log_interval: int = 50
    monitor: str = "Recall@10_val"
    monitor_mode: str = "max"
    patience: int = 5  # early-stopping checks without improvement
    ckpt_dir: Optional[str] = None
    resume: bool = False
    # Graceful wall-clock budget (Lightning `Trainer(max_time=...)` parity):
    # fit() stops after the first train step that crosses the limit, so the
    # final validation/checkpoint/export still run — unlike an external
    # `timeout` kill, which would drop everything since the last save.
    time_limit_s: Optional[float] = None
    # Divergence guard (reprover_tpu.training.health): abort with
    # DivergenceError when the loss EMA stays above factor x its running
    # min for `divergence_patience` consecutive log windows — the warmup-
    # peak blow-up that silently poisoned the round-4 flagship pretrain.
    # None disables.
    divergence_factor: Optional[float] = None
    divergence_patience: int = 6


class Trainer:
    """Drive (train_step, loaders, validate) to completion."""

    def __init__(
        self,
        config: TrainerConfig,
        train_step: Callable,  # (state, batch) -> (state, loss); jit'd + donated
        writer: MetricWriter,
        validate_fn: Optional[ValidateFn] = None,
        on_train_batch_end: Optional[Callable[[], None]] = None,
    ) -> None:
        self.config = config
        self.train_step = train_step
        self.writer = writer
        self.validate_fn = validate_fn
        self.on_train_batch_end = on_train_batch_end
        self.ckpt: Optional[CheckpointManager] = None
        if config.ckpt_dir:
            self.ckpt = CheckpointManager(
                config.ckpt_dir, monitor=config.monitor, mode=config.monitor_mode
            )

    def fit(self, state: TrainState, train_loader: Iterable) -> TrainState:
        cfg = self.config
        step = int(np.asarray(state.step))
        if self.ckpt and cfg.resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            step = int(np.asarray(state.step))
            logger.info("resumed from checkpoint at step %d", step)

        best = -math.inf if cfg.monitor_mode == "max" else math.inf
        checks_since_improvement = 0
        guard = None
        if cfg.divergence_factor is not None:
            from reprover_tpu.training.health import DivergenceGuard

            guard = DivergenceGuard(
                factor=cfg.divergence_factor,
                patience=cfg.divergence_patience,
            )
        t_start = time.monotonic()
        t_last = t_start
        done = False

        while not done:
            epoch_had_batches = False
            for batch in train_loader:
                epoch_had_batches = True
                state, loss = self.train_step(state, numeric_batch(batch))
                step += 1
                if self.on_train_batch_end is not None:
                    # e.g. mark corpus embeddings stale
                    # (`retrieval/model.py:170-172`).
                    self.on_train_batch_end()

                if step % cfg.log_interval == 0:
                    now = time.monotonic()
                    sps = cfg.log_interval / (now - t_last)
                    t_last = now
                    loss_f = float(loss)
                    self.writer.write(
                        step, {"loss": loss_f, "steps_per_sec": sps}
                    )
                    if guard is not None:
                        # Raises DivergenceError: better a non-zero exit than
                        # exporting a silently-poisoned checkpoint.
                        guard.update(step, loss_f)

                if self.validate_fn and step % cfg.val_interval == 0:
                    metrics = self._validate(state, step)
                    # Save regardless of whether the monitored key exists:
                    # a task that validates a different metric (e.g.
                    # pretraining's loss_val under the retrieval-default
                    # monitor) must still persist its progress — the
                    # manager keeps it as latest; best-tracking and early
                    # stopping only engage when the monitor is present.
                    if self.ckpt:
                        self.ckpt.save(step, state, metrics)
                    current = metrics.get(cfg.monitor)
                    if current is not None:
                        improved = (
                            current > best
                            if cfg.monitor_mode == "max"
                            else current < best
                        )
                        if improved:
                            best = current
                            checks_since_improvement = 0
                        else:
                            checks_since_improvement += 1
                        if checks_since_improvement >= cfg.patience:
                            logger.info(
                                "early stopping: no %s improvement in %d checks",
                                cfg.monitor,
                                cfg.patience,
                            )
                            done = True
                            break
                    # Validation/ckpt time must not pollute the next
                    # steps_per_sec window (it covers train steps only).
                    t_last = time.monotonic()
                if step >= cfg.max_steps:
                    done = True
                    break
                if (
                    cfg.time_limit_s is not None
                    and time.monotonic() - t_start >= cfg.time_limit_s
                ):
                    logger.info(
                        "time limit reached (%.0fs) at step %d — stopping",
                        cfg.time_limit_s,
                        step,
                    )
                    done = True
                    break
            if not epoch_had_batches:
                break  # empty loader — nothing to train on

        if self.validate_fn and step % cfg.val_interval != 0:
            metrics = self._validate(state, step)
            if self.ckpt:
                self.ckpt.save(step, state, metrics)
        if self.ckpt:
            self.ckpt.wait()
        return state

    def _validate(self, state: TrainState, step: int) -> Dict[str, float]:
        metrics = self.validate_fn(state, step)
        self.writer.write(step, metrics)
        return metrics
