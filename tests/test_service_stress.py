"""Inference-service concurrency: many concurrent searches share one device
owner; requests coalesce into batches; per-request errors are contained
(SURVEY.md §5 — the shared TPU service introduces real shared state, so it
gets a stress test the reference never needed)."""

import asyncio
import threading
import time

import pytest

from reprover_tpu.data import Pos
from reprover_tpu.prover import InferenceService, RemoteTacticGenerator


class _SlowStub:
    """Deterministic per-state generator with a simulated device latency."""

    max_inp_seq_len = 256

    def __init__(self, delay: float = 0.01) -> None:
        self.delay = delay

    def generate(self, states, num_samples):
        time.sleep(self.delay)  # one batch == one device round
        return [[(f"tac<{s}>", -0.5)] for s in states]


class _ExplodingStub:
    max_inp_seq_len = 256

    def generate(self, states, num_samples):
        raise RuntimeError("device on fire")


def test_concurrent_clients_coalesce():
    service = InferenceService(_SlowStub(), max_batch=8, batch_window_s=0.02)
    clients = [service.client() for _ in range(8)]
    service.start()
    try:
        results = [None] * 8

        def worker(i):
            gen = RemoteTacticGenerator(clients[i])
            results[i] = asyncio.run(
                gen.generate(f"⊢ s{i}", "f.lean", "t", Pos(1, 1), 1)
            )

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(not t.is_alive() for t in threads)
        # Every client got ITS OWN state's answer (no cross-wiring).
        for i in range(8):
            assert results[i] == [(f"tac<⊢ s{i}>", -0.5)], results[i]
        # Coalescing actually happened: fewer device rounds than requests.
        assert service.stats["requests"] == 8
        assert service.stats["batches"] < 8
    finally:
        service.stop()


def test_error_containment():
    service = InferenceService(_ExplodingStub())
    client = service.client()
    service.start()
    try:
        gen = RemoteTacticGenerator(client)
        with pytest.raises(RuntimeError, match="device on fire"):
            asyncio.run(gen.generate("⊢ x", "f.lean", "t", Pos(1, 1), 1))
        # The service thread survives a request failure.
        assert service._thread.is_alive()
    finally:
        service.stop()


def test_sequential_requests_same_client():
    service = InferenceService(_SlowStub(delay=0.0))
    client = service.client()
    service.start()
    try:
        gen = RemoteTacticGenerator(client)
        for i in range(5):
            out = asyncio.run(gen.generate(f"⊢ q{i}", "f", "t", Pos(1, 1), 1))
            assert out == [(f"tac<⊢ q{i}>", -0.5)]
    finally:
        service.stop()
