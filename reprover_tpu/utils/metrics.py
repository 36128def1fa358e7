"""Pluggable metric/experiment tracking.

The reference logs scalars through Lightning's ``self.log(...,
sync_dist=True)`` into WandB (`/root/reference/retrieval/confs/
cli_lean4_random.yaml:12-16`). Here metric values are computed as jnp/psum
reductions inside the jit'd steps; this module only *emits* host-side floats
through a writer interface: JSONL (always works), stdout, and wandb if the
package is importable (SURVEY.md §5 metrics/observability plan).
"""

from __future__ import annotations

import json
import logging
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)

Scalars = Dict[str, float]
TextRows = List[Dict[str, str]]


class MetricWriter:
    def write(self, step: int, scalars: Scalars) -> None:
        raise NotImplementedError

    def write_text(self, step: int, key: str, rows: TextRows) -> None:
        """Log a small table of text samples (the reference's WandB
        input/output tables during generator validation,
        `/root/reference/generation/model.py:139-155`). Optional."""

    def write_hparams(self, hparams: Dict) -> None:
        pass

    def close(self) -> None:
        pass


class JsonlWriter(MetricWriter):
    """Append one JSON object per write — the durable experiment log."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._f = open(path, "a")

    def write(self, step: int, scalars: Scalars) -> None:
        rec = {"step": step, "time": time.time(), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def write_text(self, step: int, key: str, rows: TextRows) -> None:
        rec = {"step": step, "text_table": key, "rows": rows}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def write_hparams(self, hparams: Dict) -> None:
        self._f.write(json.dumps({"hparams": hparams}) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class StdoutWriter(MetricWriter):
    def __init__(self, every: int = 1) -> None:
        self.every = every

    def write(self, step: int, scalars: Scalars) -> None:
        if step % self.every == 0:
            parts = ", ".join(f"{k}={v:.6g}" for k, v in scalars.items())
            logger.info("step %d: %s", step, parts)


class WandbWriter(MetricWriter):
    """WandB sink, parity with the reference's logger config; requires the
    ``wandb`` package (not bundled — gated)."""

    def __init__(self, project: str, name: Optional[str] = None) -> None:
        import wandb  # gated import

        self._wandb = wandb
        self.run = wandb.init(project=project, name=name)

    def write(self, step: int, scalars: Scalars) -> None:
        self._wandb.log(scalars, step=step)

    def write_text(self, step: int, key: str, rows: TextRows) -> None:
        if not rows:
            return
        cols = list(rows[0].keys())
        table = self._wandb.Table(
            columns=cols, data=[[r.get(c, "") for c in cols] for r in rows]
        )
        self._wandb.log({key: table}, step=step)

    def write_hparams(self, hparams: Dict) -> None:
        self.run.config.update(hparams, allow_val_change=True)

    def close(self) -> None:
        self._wandb.finish()


class MultiWriter(MetricWriter):
    def __init__(self, writers: List[MetricWriter]) -> None:
        self.writers = writers

    def write(self, step: int, scalars: Scalars) -> None:
        for w in self.writers:
            w.write(step, scalars)

    def write_text(self, step: int, key: str, rows: TextRows) -> None:
        for w in self.writers:
            w.write_text(step, key, rows)

    def write_hparams(self, hparams: Dict) -> None:
        for w in self.writers:
            w.write_hparams(hparams)

    def close(self) -> None:
        for w in self.writers:
            w.close()


def make_writer(
    log_dir: Optional[str],
    wandb_project: Optional[str] = None,
    stdout_every: int = 50,
) -> MetricWriter:
    writers: List[MetricWriter] = [StdoutWriter(stdout_every)]
    if log_dir:
        import os

        os.makedirs(log_dir, exist_ok=True)
        writers.append(JsonlWriter(os.path.join(log_dir, "metrics.jsonl")))
    if wandb_project:
        try:
            writers.append(WandbWriter(wandb_project))
        except ImportError:
            logger.warning("wandb not installed; skipping WandB logging")
    return MultiWriter(writers)
