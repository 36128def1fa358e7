"""Utilities: metric writers, checkpointing, config, misc glue."""

from reprover_tpu.utils.metrics import (
    JsonlWriter,
    MetricWriter,
    MultiWriter,
    StdoutWriter,
    make_writer,
)
from reprover_tpu.utils.checkpoint import CheckpointManager
from reprover_tpu.utils.misc import set_logger, zip_strict
from reprover_tpu.utils.profiling import SectionTimer, device_trace

__all__ = [
    "JsonlWriter",
    "MetricWriter",
    "MultiWriter",
    "StdoutWriter",
    "make_writer",
    "CheckpointManager",
    "set_logger",
    "zip_strict",
    "SectionTimer",
    "device_trace",
]
