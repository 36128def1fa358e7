"""Orbax-backed training checkpoints.

Replaces the reference's three-format checkpoint zoo (Lightning/DeepSpeed
ZeRO dirs + zero_to_fp32 conversion + HF save_pretrained,
`/root/reference/common.py:408-425`, `scripts/convert_checkpoint.py:9-18`)
with one sharded async Orbax store for training state plus the HF
import/export converters in :mod:`reprover_tpu.models.hf_import` for serving
artifacts (SURVEY.md §5 checkpoint/resume plan).

Semantics parity with the reference's Lightning callbacks
(`retrieval/confs/cli_lean4_random.yaml:23-35`): keep the best checkpoint by
a monitored metric (``save_top_k=1``) and always keep the latest
(``save_last``).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Best-by-metric + latest checkpoints of a ``TrainState`` pytree."""

    def __init__(
        self,
        directory: str,
        monitor: Optional[str] = None,
        mode: str = "max",
        keep_last_n: int = 1,
    ) -> None:
        self.monitor = monitor
        self.mode = mode
        # best_fn must tolerate saves whose metrics lack the monitored key
        # (e.g. a time-limit save between validations): rank them strictly
        # worse than any real value instead of raising KeyError — that
        # exact KeyError killed a round-4 pretrain chunk's final save AND
        # its export, silently losing 21k steps of training.
        worst = float("-inf") if mode == "max" else float("inf")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=1 + keep_last_n,
            best_fn=(lambda m: m.get(self.monitor, worst)) if monitor else None,
            best_mode=mode if monitor else "max",
            # keep the latest even when it is not the best (save_last)
            keep_checkpoints_without_metrics=True,
            create=True,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(
        self, step: int, state: Any, metrics: Optional[Dict[str, float]] = None
    ) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics or {},
        )

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (shapes/shardings)."""
        if step is None:
            step = self._mgr.latest_step()
        assert step is not None, "no checkpoint to restore"
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
