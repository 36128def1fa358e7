"""Pallas beam-reorder gather kernel vs the einsum reference path.

The kernel (`ops/beam_reorder.py`) must be bit-exact with
`generation/engine.py::reorder_append` for both caches, including frozen
slots (identity parents, no column read) and per-slot positions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reprover_tpu.generation.engine import reorder_append
from reprover_tpu.ops.beam_reorder import reorder_append_gather

L, S, K, H, T, D = 2, 3, 4, 2, 8, 4


@pytest.mark.parametrize("seed", [0, 1])
def test_gather_matches_einsum(seed):
    rng = jax.random.PRNGKey(seed)
    rk, rv, rck, rcv, rp = jax.random.split(rng, 5)
    k_cache = jax.random.normal(rk, (L, S, K, H, T, D), jnp.float32)
    v_cache = jax.random.normal(rv, (L, S, K, H, T, D), jnp.float32)
    k_col = jax.random.normal(rck, (L, S, K, H, 1, D), jnp.float32)
    v_col = jax.random.normal(rcv, (L, S, K, H, 1, D), jnp.float32)
    parent = jax.random.randint(rp, (S, K), 0, K, jnp.int32)
    frozen = jnp.asarray([False, True, False])
    pos = jnp.asarray([0, 5, T - 1], jnp.int32)

    want_k = reorder_append(k_cache, k_col, parent, frozen, pos)
    want_v = reorder_append(v_cache, v_col, parent, frozen, pos)
    got_k, got_v = reorder_append_gather(
        k_cache, v_cache, k_col, v_col, parent, frozen, pos, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_gather_frozen_slot_keeps_rows():
    """A fully frozen batch must reduce to the identity copy plus the
    (harmless, never-read) column install at each slot's pos."""
    k_cache = jnp.arange(L * S * K * H * T * D, dtype=jnp.float32).reshape(
        L, S, K, H, T, D
    )
    v_cache = k_cache + 1.0
    k_col = jnp.full((L, S, K, H, 1, D), -1.0)
    v_col = jnp.full((L, S, K, H, 1, D), -2.0)
    parent = jnp.zeros((S, K), jnp.int32)  # would collapse all beams to 0
    frozen = jnp.ones((S,), bool)  # ...but frozen forces identity
    pos = jnp.full((S,), 3, jnp.int32)
    got_k, got_v = reorder_append_gather(
        k_cache, v_cache, k_col, v_col, parent, frozen, pos, interpret=True
    )
    want_k = reorder_append(k_cache, k_col, parent, frozen, pos)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    # rows untouched except the pos column
    np.testing.assert_array_equal(
        np.asarray(got_v)[:, :, :, :, :3], np.asarray(v_cache)[:, :, :, :, :3]
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_scan_matches_einsum(seed):
    """The layer-blocked in-place reorder (``reorder_mode="scan"``, built
    so a loop-carried 13B-geometry int4 serving program holds one cache
    copy instead of two) must be bit-exact with the whole-cache einsum."""
    from reprover_tpu.generation.engine import reorder_append_scan

    rng = jax.random.PRNGKey(100 + seed)
    rk, rv, rck, rcv, rp = jax.random.split(rng, 5)
    k_cache = jax.random.normal(rk, (L, S, K, H, T, D), jnp.float32)
    v_cache = jax.random.normal(rv, (L, S, K, H, T, D), jnp.float32)
    k_col = jax.random.normal(rck, (L, S, K, H, 1, D), jnp.float32)
    v_col = jax.random.normal(rcv, (L, S, K, H, 1, D), jnp.float32)
    parent = jax.random.randint(rp, (S, K), 0, K, jnp.int32)
    frozen = jnp.asarray([False, True, False])
    pos = jnp.asarray([0, 5, T - 1], jnp.int32)

    want_k = reorder_append(k_cache, k_col, parent, frozen, pos)
    want_v = reorder_append(v_cache, v_col, parent, frozen, pos)
    got_k, got_v = jax.jit(reorder_append_scan)(
        k_cache, v_cache, k_col, v_col, parent, frozen, pos
    )
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_production_reorder_default_is_auto():
    """Round-4 measurements (BASELINE.md): the one-hot einsum moves both
    caches ~2x faster than the Pallas gather at byt5/d1024 engine shapes,
    but at 7B+ geometry the layer-blocked scan is 1.10x faster AND keeps
    the loop-carried decode program to ONE cache copy (the einsum's
    while-carry double-buffer is a runtime OOM at 13B). The engines must
    default to "auto" — einsum below AUTO_SCAN_CACHE_BYTES of KV cache,
    scan at or above — so the 13B-on-one-chip deployment works without a
    flag. If the threshold or default is ever changed, re-measure with
    benchmarks/reorder_microbench.py + causal7b_serve.py first."""
    from reprover_tpu.generation.engine import (
        AUTO_SCAN_CACHE_BYTES,
        StepwiseEngineBase,
        resolve_reorder_mode,
    )

    class _Probe(StepwiseEngineBase):
        def __init__(self):  # skip device-program construction
            self.mesh = None
            self.reorder_mode = "auto"

    assert _Probe()._reorder_mode() == "auto"

    # trace-time resolution: small caches keep the einsum, big go scan
    assert resolve_reorder_mode("auto", AUTO_SCAN_CACHE_BYTES - 1) == "einsum"
    assert resolve_reorder_mode("auto", AUTO_SCAN_CACHE_BYTES) == "scan"
    # explicit modes pass through untouched
    for mode in ("einsum", "gather", "scan"):
        assert resolve_reorder_mode(mode, 0) == mode
        assert resolve_reorder_mode(mode, 1 << 40) == mode

    from reprover_tpu.generation.causal_engine import CausalStepwiseEngine
    from reprover_tpu.generation.engine import StepwiseBeamEngine
    import inspect

    for cls in (StepwiseBeamEngine, CausalStepwiseEngine):
        sig = inspect.signature(cls.__init__)
        assert sig.parameters["reorder_mode"].default == "auto"


def test_reorder_mode_threads_through_serving_stack():
    """`reorder_mode` must be selectable from the serving boundary (the
    13B-int4-on-one-chip deployment needs "scan"): generator wrappers and
    the streaming service all expose and forward it."""
    import inspect

    from reprover_tpu.generation.causal_generator import (
        CausalTacticGeneratorModel,
    )
    from reprover_tpu.generation.generator import TacticGeneratorModel
    from reprover_tpu.prover.service import StreamingInferenceService

    for fn in (
        TacticGeneratorModel.make_stepwise_engine,
        CausalTacticGeneratorModel.make_stepwise_engine,
        StreamingInferenceService.__init__,
    ):
        sig = inspect.signature(fn)
        assert sig.parameters["reorder_mode"].default == "auto", fn
    for fn in (
        TacticGeneratorModel.make_stepwise_engine,
        CausalTacticGeneratorModel.make_stepwise_engine,
        StreamingInferenceService._build_engine,
    ):
        src = inspect.getsource(fn)
        assert "reorder_mode=" in src.replace(
            'reorder_mode: str = "auto"', ""
        ), f"{fn} does not forward reorder_mode"
