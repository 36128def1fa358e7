"""Tests for the training subsystem: schedule, train steps, sharded steps.

Parity targets: `/root/reference/common.py:381-405` (AdamW +
constant-with-warmup), `/root/reference/retrieval/model.py:116-140` (MSE
in-batch-negative loss), `/root/reference/generation/model.py:101-111` (CE).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reprover_tpu.models.t5 import T5Config, init_params
from reprover_tpu.parallel import make_mesh
from reprover_tpu.training import (
    constant_warmup_schedule,
    generation_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
    retrieval_loss,
)

TINY = T5Config(
    vocab_size=384,
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=2,
)


def _retrieval_batch(rng, b=8, n=1, length=16):
    ids = rng.integers(3, 200, size=(b, length)).astype(np.int32)
    prem = rng.integers(3, 200, size=(b * (1 + n), length)).astype(np.int32)
    label = np.zeros((b, b * (1 + n)), dtype=np.float32)
    label[np.arange(b), np.arange(b)] = 1.0
    return {
        "context_ids": jnp.asarray(ids),
        "context_mask": jnp.ones((b, length), jnp.int32),
        "premise_ids": jnp.asarray(prem),
        "premise_mask": jnp.ones((b * (1 + n), length), jnp.int32),
        "label": jnp.asarray(label),
    }


def _generation_batch(rng, b=8, src=16, tgt=8):
    state_ids = rng.integers(3, 200, size=(b, src)).astype(np.int32)
    tactic_ids = rng.integers(3, 200, size=(b, tgt)).astype(np.int32)
    tactic_ids[:, -2:] = -100  # padding region
    return {
        "state_ids": jnp.asarray(state_ids),
        "state_mask": jnp.ones((b, src), jnp.int32),
        "tactic_ids": jnp.asarray(tactic_ids),
    }


class TestSchedule:
    def test_constant_warmup(self):
        sched = constant_warmup_schedule(1e-3, 100)
        assert float(sched(0)) == 0.0
        assert float(sched(50)) == pytest.approx(5e-4)
        assert float(sched(100)) == pytest.approx(1e-3)
        assert float(sched(100000)) == pytest.approx(1e-3)

    def test_no_warmup(self):
        sched = constant_warmup_schedule(1e-3, 0)
        assert float(sched(0)) == pytest.approx(1e-3)


class TestTrainSteps:
    def test_retrieval_loss_decreases(self):
        rng = np.random.default_rng(0)
        params = init_params(jax.random.PRNGKey(0), TINY)
        params.pop("decoder", None)
        params.pop("lm_head", None)
        tx = make_optimizer(1e-3, warmup_steps=2)
        state = init_train_state(params, tx)
        step = make_train_step(retrieval_loss, TINY, tx)
        batch = _retrieval_batch(rng)
        losses = []
        for _ in range(5):
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_retrieval_loss_mse_formula(self):
        """Loss == mean((sim - label)^2) over the full matrix."""
        rng = np.random.default_rng(1)
        params = init_params(jax.random.PRNGKey(1), TINY)
        batch = _retrieval_batch(rng, b=4, n=1)
        loss = retrieval_loss(params, TINY, batch)

        from reprover_tpu.models.t5 import encode
        from reprover_tpu.ops import masked_mean_normalize

        ctx = masked_mean_normalize(
            encode(params, TINY, batch["context_ids"], batch["context_mask"]),
            batch["context_mask"],
        )
        prem = masked_mean_normalize(
            encode(params, TINY, batch["premise_ids"], batch["premise_mask"]),
            batch["premise_mask"],
        )
        sim = np.asarray(ctx) @ np.asarray(prem).T
        expected = np.mean((sim - np.asarray(batch["label"])) ** 2)
        assert float(loss) == pytest.approx(float(expected), rel=1e-5)

    def test_infonce_loss_decreases_and_formula(self):
        """Opt-in contrastive objective: correct multi-positive NLL, trains."""
        from reprover_tpu.training import retrieval_infonce_loss

        rng = np.random.default_rng(7)
        params = init_params(jax.random.PRNGKey(7), TINY)
        params.pop("decoder", None)
        params.pop("lm_head", None)
        batch = _retrieval_batch(rng, b=4, n=1)
        # multi-positive row: context 0 also matches premise 5
        batch["label"] = batch["label"].at[0, 5].set(1.0)

        loss = retrieval_infonce_loss(params, TINY, batch)
        from reprover_tpu.models.t5 import encode
        from reprover_tpu.ops import masked_mean_normalize

        ctx = masked_mean_normalize(
            encode(params, TINY, batch["context_ids"], batch["context_mask"]),
            batch["context_mask"],
        )
        prem = masked_mean_normalize(
            encode(params, TINY, batch["premise_ids"], batch["premise_mask"]),
            batch["premise_mask"],
        )
        logits = (np.asarray(ctx, np.float64) @ np.asarray(prem, np.float64).T) / 0.05
        lab = np.asarray(batch["label"])
        nll = []
        for i in range(4):
            z = np.log(np.exp(logits[i]).sum())
            pos = np.log(np.exp(logits[i][lab[i] > 0]).sum())
            nll.append(z - pos)
        assert float(loss) == pytest.approx(float(np.mean(nll)), rel=1e-4)

        tx = make_optimizer(1e-3, warmup_steps=2)
        state = init_train_state(params, tx)
        step = make_train_step(retrieval_infonce_loss, TINY, tx)
        losses = []
        for _ in range(5):
            state, l = step(state, batch)
            losses.append(float(l))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_mixed_length_batch(self):
        """Context and premise buckets of different lengths: two encoder
        passes, still correct."""
        rng = np.random.default_rng(2)
        params = init_params(jax.random.PRNGKey(2), TINY)
        batch = _retrieval_batch(rng, b=4, n=1, length=16)
        batch["premise_ids"] = jnp.pad(batch["premise_ids"], ((0, 0), (0, 8)))
        batch["premise_mask"] = jnp.pad(batch["premise_mask"], ((0, 0), (0, 8)))
        loss = retrieval_loss(params, TINY, batch)
        assert np.isfinite(float(loss))

    def test_generation_loss_decreases(self):
        rng = np.random.default_rng(3)
        params = init_params(jax.random.PRNGKey(3), TINY)
        tx = make_optimizer(1e-3, warmup_steps=2)
        state = init_train_state(params, tx)
        step = make_train_step(generation_loss, TINY, tx)
        batch = _generation_batch(rng)
        losses = []
        for _ in range(5):
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestShardedTrainStep:
    def test_mesh_retrieval_step(self):
        """DP over 8 virtual devices + ZeRO-sharded moments."""
        mesh = make_mesh(data=8, model=1)
        rng = np.random.default_rng(4)
        params = init_params(jax.random.PRNGKey(4), TINY)
        params.pop("decoder", None)
        params.pop("lm_head", None)
        tx = make_optimizer(1e-3, warmup_steps=2)
        state = init_train_state(params, tx)
        step = make_train_step(retrieval_loss, TINY, tx, mesh=mesh)
        batch = _retrieval_batch(rng, b=8, n=1)
        state, loss1 = step(state, batch)
        state, _ = step(state, batch)
        state, loss3 = step(state, batch)
        assert np.isfinite(float(loss1)) and float(loss3) < float(loss1)
        # Optimizer moments actually sharded over the data axis.
        adam_state = state.opt_state[1][0]  # chain(clip, adamw) -> adamw
        assert any(
            not leaf.sharding.is_fully_replicated
            for leaf in jax.tree.leaves(adam_state.mu)
        )

    def test_mesh_matches_single_device(self):
        """Sharded step computes the same loss as the unsharded step."""
        rng = np.random.default_rng(5)
        params = init_params(jax.random.PRNGKey(5), TINY)
        tx = make_optimizer(1e-3, warmup_steps=2)
        batch = _generation_batch(rng, b=8)

        # Copy: each step donates (deletes) its input state's buffers.
        params_b = jax.tree.map(jnp.array, params)
        state_a = init_train_state(params, tx)
        step_a = make_train_step(generation_loss, TINY, tx)
        _, loss_a = step_a(state_a, batch)

        mesh = make_mesh(data=4, model=2)
        state_b = init_train_state(params_b, tx)
        step_b = make_train_step(
            generation_loss, TINY, tx, mesh=mesh, model_parallel=True
        )
        _, loss_b = step_b(state_b, batch)
        assert float(loss_a) == pytest.approx(float(loss_b), rel=2e-4)


def test_offload_opt_state_matches_on_device():
    """Host-offloaded optimizer state (pinned_host streaming) produces the
    same update as the on-device step (DeepSpeedCPUAdam role,
    `/root/reference/common.py:387-393`)."""
    import jax

    # The CPU backend advertises pinned_host but aborts executing a jit that
    # streams between memory kinds — this path is TPU-only.
    if jax.devices()[0].platform != "tpu":
        pytest.skip("pinned_host streaming requires a TPU backend")

    import numpy as np

    from reprover_tpu.models.t5 import T5Config, init_params
    from reprover_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
        offload_opt_state,
        retrieval_loss,
    )

    cfg = T5Config(
        d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=1,
    )
    rng = np.random.default_rng(0)
    b = 2
    batch = {
        "context_ids": jnp.asarray(rng.integers(3, 384, (b, 32)), jnp.int32),
        "context_mask": jnp.ones((b, 32), jnp.int32),
        "premise_ids": jnp.asarray(rng.integers(3, 384, (2 * b, 32)), jnp.int32),
        "premise_mask": jnp.ones((2 * b, 32), jnp.int32),
        "label": jnp.zeros((b, 2 * b), jnp.float32),
    }
    tx = make_optimizer(1e-3, 2)

    params = init_params(jax.random.PRNGKey(0), cfg)
    s_dev = init_train_state(params, tx)
    dev_step = make_train_step(retrieval_loss, cfg, tx)
    s_dev, loss_dev = dev_step(s_dev, batch)

    params = init_params(jax.random.PRNGKey(0), cfg)
    s_host = offload_opt_state(init_train_state(params, tx))
    host_step = make_train_step(retrieval_loss, cfg, tx, offload_opt=True)
    s_host, loss_host = host_step(s_host, batch)

    np.testing.assert_allclose(float(loss_dev), float(loss_host), rtol=1e-6)
    for a, c in zip(jax.tree.leaves(s_dev.params), jax.tree.leaves(s_host.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6, atol=1e-7)
    kinds_after = {
        x.sharding.memory_kind for x in jax.tree.leaves(s_host.opt_state)
        if hasattr(x, "sharding")
    }
    assert kinds_after == {"pinned_host"}


def test_offload_remat_rejected_under_mesh():
    """remat_policy='offload' + mesh must fail fast with a clear error
    (XLA SPMD partitioner RET_CHECKs the policy's placement custom-calls)."""
    import dataclasses as dc

    import pytest

    from reprover_tpu.models.t5 import T5Config
    from reprover_tpu.parallel import make_mesh
    from reprover_tpu.training import make_optimizer, make_train_step, retrieval_loss

    cfg = dc.replace(
        T5Config(d_model=32, d_kv=8, d_ff=64, num_heads=4,
                 num_encoder_layers=2, num_decoder_layers=1),
        remat=True, remat_policy="offload",
    )
    with pytest.raises(ValueError, match="single-device"):
        make_train_step(
            retrieval_loss, cfg, make_optimizer(1e-3, 10), mesh=make_mesh(data=8)
        )
