"""Jitted train/eval step builders for the retrieval and generation tasks.

Replaces the reference's LightningModule training plumbing
(`/root/reference/retrieval/model.py:116-177`,
`/root/reference/generation/model.py:101-132`) with the idiomatic JAX shape:
a pure loss function + one donated, mesh-sharded, jit'd update step.

Parallelism (SURVEY.md §2.3):
- batch arrays are sharded over the mesh ``data`` axis (DP);
- optimizer moments are sharded over ``data`` (ZeRO-2 equivalent — optax
  updates are elementwise, XLA inserts the reduce-scatter/all-gather pair);
- params can additionally be Megatron-sharded over ``model`` (TP) via
  :func:`reprover_tpu.parallel.param_partition_specs`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reprover_tpu.models.t5 import (
    Params,
    T5Config,
    encode,
    forward_loss,
)
from reprover_tpu.ops import masked_mean_normalize
from reprover_tpu.parallel import (
    param_partition_specs,
    zero_partition_specs,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    """Step counter + params + optimizer state, as one donatable pytree."""

    step: jnp.ndarray
    params: Params
    opt_state: Any

    def tree_flatten(self) -> tuple:
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux: None, children: tuple) -> "TrainState":
        return cls(*children)


def init_train_state(params: Params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


# ------------------------------------------------------------------ #
# Loss functions
# ------------------------------------------------------------------ #


def retrieval_loss(
    params: Params,
    cfg: T5Config,
    batch: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """In-batch-negative MSE loss (`retrieval/model.py:116-140`).

    Encoder runs ONCE over the stacked [B + B*(1+n), L] context+premise
    tensor when shapes agree (single big MXU matmul chain), else twice.
    similarity = ctx_emb @ premise_emb.T in fp32; loss = MSE against the
    binary multi-positive label matrix — deliberately *not* InfoNCE
    (parity-critical, SURVEY.md §7.2).
    """
    ctx_ids, ctx_mask = batch["context_ids"], batch["context_mask"]
    prem_ids, prem_mask = batch["premise_ids"], batch["premise_mask"]

    if ctx_ids.shape[1] == prem_ids.shape[1]:
        ids = jnp.concatenate([ctx_ids, prem_ids], axis=0)
        mask = jnp.concatenate([ctx_mask, prem_mask], axis=0)
        emb = masked_mean_normalize(encode(params, cfg, ids, mask), mask)
        ctx_emb, prem_emb = emb[: ctx_ids.shape[0]], emb[ctx_ids.shape[0] :]
    else:
        ctx_emb = masked_mean_normalize(
            encode(params, cfg, ctx_ids, ctx_mask), ctx_mask
        )
        prem_emb = masked_mean_normalize(
            encode(params, cfg, prem_ids, prem_mask), prem_mask
        )

    similarity = jnp.dot(
        ctx_emb, prem_emb.T, preferred_element_type=jnp.float32
    )
    return jnp.mean(jnp.square(similarity - batch["label"]))


def retrieval_infonce_loss(
    params: Params,
    cfg: T5Config,
    batch: Dict[str, jnp.ndarray],
    temperature: float = 0.05,
) -> jnp.ndarray:
    """Multi-positive InfoNCE over the in-batch similarity matrix.

    Beyond-parity alternative to :func:`retrieval_loss` (opt in with
    ``--model.loss infonce``): -log(sum_pos exp(s/t) / sum_all exp(s/t))
    per context, the standard dense-retrieval contrastive objective
    (Tevatron/DPR family — PAPERS.md). Converges far faster than the
    reference's MSE objective when training from scratch; the reference's
    own recipe (`retrieval/model.py:116-140`) remains the default.
    """
    ctx_ids, ctx_mask = batch["context_ids"], batch["context_mask"]
    prem_ids, prem_mask = batch["premise_ids"], batch["premise_mask"]

    if ctx_ids.shape[1] == prem_ids.shape[1]:
        ids = jnp.concatenate([ctx_ids, prem_ids], axis=0)
        mask = jnp.concatenate([ctx_mask, prem_mask], axis=0)
        emb = masked_mean_normalize(encode(params, cfg, ids, mask), mask)
        ctx_emb, prem_emb = emb[: ctx_ids.shape[0]], emb[ctx_ids.shape[0] :]
    else:
        ctx_emb = masked_mean_normalize(
            encode(params, cfg, ctx_ids, ctx_mask), ctx_mask
        )
        prem_emb = masked_mean_normalize(
            encode(params, cfg, prem_ids, prem_mask), prem_mask
        )

    logits = (
        jnp.dot(ctx_emb, prem_emb.T, preferred_element_type=jnp.float32)
        / temperature
    )
    labels = batch["label"]
    log_z = jax.nn.logsumexp(logits, axis=1)  # [B]
    # log-sum-exp restricted to the positive columns; rows with no positive
    # (possible after premise dedup/packing) contribute 0.
    has_pos = jnp.sum(labels, axis=1) > 0
    pos_logits = jnp.where(labels > 0, logits, -jnp.inf)
    log_pos = jax.nn.logsumexp(pos_logits, axis=1)
    nll = jnp.where(has_pos, log_z - log_pos, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(has_pos), 1)


def generation_loss(
    params: Params,
    cfg: T5Config,
    batch: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """Teacher-forced seq2seq CE with -100 masking
    (`generation/model.py:101-111`)."""
    return forward_loss(
        params, cfg, batch["state_ids"], batch["state_mask"], batch["tactic_ids"]
    )


# ------------------------------------------------------------------ #
# Step builders
# ------------------------------------------------------------------ #

LossFn = Callable[[Params, T5Config, Dict[str, jnp.ndarray]], jnp.ndarray]


def opt_state_host_sharding(mesh: Optional[Mesh] = None) -> Any:
    """Sharding that places a pytree in TPU host memory (``pinned_host``).

    The reference's DeepSpeedCPUAdam role (`/root/reference/common.py:387-393`):
    optimizer moments live in host DRAM, streamed to the chip per update.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding

        return NamedSharding(mesh, P(), memory_kind="pinned_host")
    from jax.sharding import SingleDeviceSharding

    return SingleDeviceSharding(jax.devices()[0], memory_kind="pinned_host")


def offload_opt_state(state: TrainState, mesh: Optional[Mesh] = None) -> TrainState:
    """Move the optimizer state to host memory (pair with
    ``make_train_step(offload_opt=True)``)."""
    sh = opt_state_host_sharding(mesh)
    opt = jax.tree.map(lambda x: jax.device_put(x, sh), state.opt_state)
    return TrainState(state.step, state.params, opt)


def make_train_step(
    loss_fn: LossFn,
    cfg: T5Config,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    model_parallel: bool = False,
    offload_opt: bool = False,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, jnp.ndarray]]:
    """Build a donated, jit'd ``(state, batch) -> (state, loss)`` step.

    With a mesh, params follow their (replicated or TP) specs, optimizer
    moments are ZeRO-sharded over ``data``, and batches are DP-sharded; the
    gradient all-reduce and moment reduce-scatter ride ICI, inserted by XLA
    from the output shardings.

    ``offload_opt=True`` keeps the Adam moments in TPU host memory
    (``pinned_host``) and streams them through the chip during the update —
    the DeepSpeedCPUAdam capability (`common.py:387-393`): trades update
    bandwidth for ~2x params of freed HBM, raising the max batch size on
    16GB chips. The caller must place the initial state with
    :func:`offload_opt_state`.
    """
    if mesh is not None and cfg.remat and cfg.remat_policy == "offload":
        # XLA's SPMD partitioner RET_CHECK-rejects the replicated-sharded
        # `annotate_device_placement` custom-calls the offload policy emits
        # around replicated gradients (spmd_partitioner.cc:5746, reproduced
        # on jax 0.9 CPU mesh). Activation offload is a per-device memory
        # knob (the reference's cpu_checkpointing is likewise per-rank), so
        # fail fast rather than at compile time.
        raise ValueError(
            "remat_policy='offload' is single-device only (XLA SPMD "
            "partitioner limitation); use remat_policy='lite' under a "
            "mesh, or disable data_parallel"
        )

    def make_step(grad_shardings=None, opt_in=None, opt_out=None):
        def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, cfg, batch)
            if grad_shardings is not None:
                # Pin gradients to the param layout before the optimizer.
                # Without this, XLA is free to leave a grad sharded along an
                # axis it chose for the backward (e.g. the embedding grad
                # split over `model`), and resharding that into the
                # ZeRO-sharded moments triggers SPMD "involuntary full
                # rematerialization" (replicate-then-repartition) at every
                # step. Grad all-reduce -> param layout is the DP contract
                # anyway (DeepSpeed ZeRO-2's reduce pattern).
                grads = jax.lax.with_sharding_constraint(grads, grad_shardings)
            opt_state = state.opt_state
            if opt_in is not None:  # stream host-resident moments in
                opt_state = opt_in(opt_state)
            updates, new_opt = tx.update(grads, opt_state, state.params)
            if opt_out is not None:  # stream updated moments back out
                new_opt = opt_out(new_opt)
            new_params = optax.apply_updates(state.params, updates)
            return (
                TrainState(state.step + 1, new_params, new_opt),
                loss,
            )

        return step

    if mesh is None:
        if not offload_opt:
            return jax.jit(make_step(), donate_argnums=0)
        from jax.sharding import SingleDeviceSharding

        dev = jax.devices()[0]
        s_host = SingleDeviceSharding(dev, memory_kind="pinned_host")
        s_dev = SingleDeviceSharding(dev, memory_kind="device")
        step = make_step(
            opt_in=lambda t: jax.tree.map(lambda x: jax.device_put(x, s_dev), t),
            opt_out=lambda t: jax.tree.map(lambda x: jax.device_put(x, s_host), t),
        )
        return jax.jit(step, donate_argnums=0)

    # Shardings: params per spec, opt state ZeRO-sharded, batch DP-sharded.
    opt_kind = "pinned_host" if offload_opt else "device"

    def state_shardings(state: TrainState, opt_memory_kind=opt_kind) -> TrainState:
        pspecs = param_partition_specs(state.params, cfg, model_parallel)
        ospecs = zero_partition_specs(
            state.opt_state, mesh, param_specs=pspecs if model_parallel else None
        )
        to_sh = lambda tree, kind="device": jax.tree.map(
            lambda s: NamedSharding(mesh, s, memory_kind=kind), tree
        )
        return TrainState(
            NamedSharding(mesh, P()),
            to_sh(pspecs),
            to_sh(ospecs, opt_memory_kind),
        )

    def batch_shardings(batch: Dict[str, jnp.ndarray]):
        return {
            k: NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            for k, v in batch.items()
        }

    jitted: Dict[Any, Callable] = {}

    def dispatch(state: TrainState, batch: Dict[str, jnp.ndarray]):
        key = tuple(sorted((k, v.shape) for k, v in batch.items()))
        fn = jitted.get(key)
        if fn is None:
            shardings = state_shardings(state)
            opt_in = None
            opt_out = None
            if offload_opt:
                dev_sh = state_shardings(state, "device").opt_state
                host_sh = shardings.opt_state
                opt_in = lambda t: jax.tree.map(jax.device_put, t, dev_sh)
                opt_out = lambda t: jax.tree.map(jax.device_put, t, host_sh)
            fn = jax.jit(
                make_step(
                    grad_shardings=shardings.params,
                    opt_in=opt_in,
                    opt_out=opt_out,
                ),
                in_shardings=(shardings, batch_shardings(batch)),
                out_shardings=(state_shardings(state), NamedSharding(mesh, P())),
                donate_argnums=0,
            )
            jitted[key] = fn
        return fn(state, batch)

    return dispatch


def make_eval_step(
    loss_fn: LossFn, cfg: T5Config, mesh: Optional[Mesh] = None
) -> Callable[[Params, Dict[str, jnp.ndarray]], jnp.ndarray]:
    def step(params: Params, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return loss_fn(params, cfg, batch)

    return jax.jit(step)


def numeric_batch(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Keep only the array fields of a collated batch (jit inputs)."""
    import numpy as np

    return {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if isinstance(v, (jnp.ndarray, np.ndarray))
    }
