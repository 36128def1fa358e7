"""Optimizer: AdamW + constant-with-warmup schedule + global-norm clipping.

Parity with the reference optimizer glue (`/root/reference/common.py:381-405`):
AdamW (DeepSpeed FusedAdam semantics: weight_decay defaults to 0) with HF's
``get_constant_schedule_with_warmup`` (linear 0 -> lr over ``warmup_steps``,
then constant), stepped per optimizer step. Gradient clipping at global norm
1.0 comes from the Lightning trainer config
(`/root/reference/retrieval/confs/cli_lean4_random.yaml:17`).

TPU-native: optax transforms compose inside the jit'd train step; optimizer
moments can be sharded over the mesh ``data`` axis (ZeRO-2 equivalent, see
:func:`reprover_tpu.parallel.zero_partition_specs`) because every transform
here is elementwise.
"""

from __future__ import annotations

import optax


def constant_warmup_schedule(lr: float, warmup_steps: int) -> optax.Schedule:
    """HF ``get_constant_schedule_with_warmup``: lr * min(1, step/warmup)."""
    if warmup_steps <= 0:
        return optax.constant_schedule(lr)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.constant_schedule(lr),
        ],
        boundaries=[warmup_steps],
    )


def make_optimizer(
    lr: float,
    warmup_steps: int,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    parts = []
    if grad_clip is not None and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(
        optax.adamw(
            constant_warmup_schedule(lr, warmup_steps),
            b1=b1,
            b2=b2,
            eps=eps,
            weight_decay=weight_decay,
        )
    )
    return optax.chain(*parts)
