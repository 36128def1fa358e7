"""Profiling hooks (SURVEY.md §5 tracing plan).

The reference's only tracing is the actor/environment wall-clock split inside
``SearchResult`` (`/root/reference/prover/proof_search.py:40-53`), which this
framework preserves. On top, these helpers expose ``jax.profiler`` traces for
the device-side paths (embed / top-k / beam search):

    with device_trace("/tmp/trace"):
        retriever.reindex_corpus(64)
    # inspect with tensorboard / xprof

and a tiny section timer for host-side phases.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("jax profiler trace written to %s", log_dir)


class SectionTimer:
    """Accumulate wall-clock per named section (host-side phases)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))
