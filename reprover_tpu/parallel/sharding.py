"""PartitionSpecs for T5 params, optimizer state, and batches.

Parallelism mapping from the reference (SURVEY.md §2.3):

- DeepSpeed ZeRO-2 (grad/optimizer-state sharding over data-parallel ranks)
  -> ``zero_partition_specs``: optimizer moments sharded over ``data``;
  params stay replicated (grads all-reduce over ICI, like ZeRO-2).
- vLLM tensor parallelism -> ``param_partition_specs(model_parallel=True)``:
  Megatron-style column/row splits of attention and MLP over ``model``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reprover_tpu.models.t5 import Params, T5Config


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _mirror_quant_specs(params: Any, specs: Any) -> Any:
    """Mirror quantized nodes of ``params`` into a spec tree so tree
    structures match for ``shard_pytree``/``device_put``.

    int8 ``QuantWeight``: the scale is [..., 1, O] — it keeps the weight's
    output-channel sharding (axis -1) and replicates the contracted axis
    (-2, size 1).

    int4 ``Quant4Weight``: both ``q`` [..., K/2, O] (packed nibbles along
    K) and ``scale`` [..., K/g, O] (per-K-group) share the logical
    weight's axis semantics exactly, so both take the weight's own spec —
    column-parallel shards O on both, row-parallel shards the packed K/2
    and the K/g group axis in lockstep (group boundaries stay shard-local
    at real geometries; GSPMD keeps odd tiny shapes correct regardless)."""
    from reprover_tpu.models.quantize import Quant4Weight, QuantWeight

    def rec(p, s):
        if isinstance(p, dict):
            return {k: rec(p[k], s[k]) for k in p}
        if isinstance(p, Quant4Weight):
            return Quant4Weight(
                q=s, scale=s, kernel_ok=p.kernel_ok, group=p.group
            )
        if isinstance(p, QuantWeight):
            full = tuple(s) + (None,) * (p.q.ndim - len(tuple(s)))
            return QuantWeight(
                q=s, scale=P(*full[:-2], None, full[-1]),
                kernel_ok=p.kernel_ok,
            )
        return s

    return rec(params, specs)


def _attn_specs(layered: bool) -> Dict[str, P]:
    """Megatron split: q/k/v column-parallel (head dim), o row-parallel."""
    l = (None,) if layered else ()
    return {
        "q": P(*l, None, "model"),
        "k": P(*l, None, "model"),
        "v": P(*l, None, "model"),
        "o": P(*l, "model", None),
    }


def _mlp_specs(layered: bool, fused: bool = False) -> Dict[str, P]:
    l = (None,) if layered else ()
    if fused:  # pre-fused gate|up projection (t5.fuse_mlp_params)
        return {"wi": P(*l, None, "model"), "wo": P(*l, "model", None)}
    return {
        "wi_0": P(*l, None, "model"),
        "wi_1": P(*l, None, "model"),
        "wo": P(*l, "model", None),
    }


def param_partition_specs(
    params: Params, cfg: T5Config, model_parallel: bool = False
) -> Params:
    """PartitionSpec pytree matching ``params``.

    ``model_parallel=False`` replicates everything (pure DP — byt5-small fits
    easily); ``True`` shards attention heads and the MLP hidden dim over
    ``model`` (serving-engine TP). ``d_kv`` stays whole: the split lands on
    the head axis because inner_dim = heads * d_kv is the stored axis.
    """
    if not model_parallel:
        return jax.tree.map(lambda _: P(), params)

    fused = "wi" in params["encoder"]["layers"]["mlp"]
    norm = P(None, None)  # [L, d_model]
    out: Params = {
        "shared_embedding": P(None, None),
        "encoder": {
            "rel_bias": P(),
            "layers": {
                "attn": _attn_specs(True),
                "attn_norm": norm,
                "mlp": _mlp_specs(True, fused),
                "mlp_norm": norm,
            },
            "final_norm": P(None),
        },
    }
    if "decoder" in params:
        out["decoder"] = {
            "rel_bias": P(),
            "layers": {
                "self_attn": _attn_specs(True),
                "self_norm": norm,
                "cross_attn": _attn_specs(True),
                "cross_norm": norm,
                "mlp": _mlp_specs(True, fused),
                "mlp_norm": norm,
            },
            "final_norm": P(None),
        }
    if "lm_head" in params:
        out["lm_head"] = P(None, "model")
    return _mirror_quant_specs(params, out)


def causal_param_partition_specs(params: Params, model_parallel: bool = False) -> Any:
    """PartitionSpec pytree for :mod:`reprover_tpu.models.causal_lm` params.

    Megatron split over ``model``: q/k/v/gate/up column-parallel, o/down
    row-parallel — the reference's vLLM ``tensor_parallel_size`` role for
    decoder-only serving (`prover/proof_search.py:345`).
    """
    if not model_parallel:
        return jax.tree.map(lambda _: P(), params)
    layered = {
        "input_norm": P(None, None),
        "q": P(None, None, "model"),
        "k": P(None, None, "model"),
        "v": P(None, None, "model"),
        "o": P(None, "model", None),
        "post_norm": P(None, None),
        "gate": P(None, None, "model"),
        "up": P(None, None, "model"),
        "down": P(None, "model", None),
    }
    out: Params = {
        "embedding": P(None, None),
        "layers": layered,
        "final_norm": P(None),
    }
    if "lm_head" in params:
        out["lm_head"] = P(None, "model")
    return _mirror_quant_specs(params, out)


def zero_partition_specs(
    params: Params, mesh: Mesh, param_specs: Any = None
) -> Params:
    """ZeRO-style optimizer-state sharding specs over the ``data`` axis.

    For each leaf, shard the largest *free* axis divisible by the ``data``
    axis size (moments of a replicated param can be sharded freely — optax
    updates are elementwise, so XLA inserts the reduce-scatter/all-gather
    pair, which is exactly ZeRO-2's communication pattern). Leaves with no
    divisible axis stay replicated.

    When ``param_specs`` is given (tensor parallelism on), moment specs
    **keep the param's `model` sharding** and add ``data`` only on an axis
    the param leaves unsharded — a moment sharded against its param's layout
    forces XLA into full rematerialization at every update.
    """
    n = mesh.shape["data"]
    flat_specs = (
        jax.tree.leaves(param_specs, is_leaf=lambda x: isinstance(x, P))
        if param_specs is not None
        else None
    )
    pstruct = (
        jax.tree.structure(param_specs, is_leaf=lambda x: isinstance(x, P))
        if param_specs is not None
        else None
    )

    def spec(x, base: P = P()) -> P:
        parts: list = list(base) + [None] * (x.ndim - len(base))
        parts = parts[: x.ndim]
        if n <= 1 or x.ndim == 0:
            return P(*parts)
        order = sorted(range(x.ndim), key=lambda a: -x.shape[a])
        for axis in order:
            if (
                parts[axis] is None
                and x.shape[axis] % n == 0
                and x.shape[axis] >= n
            ):
                parts[axis] = "data"
                break
        return P(*parts)

    def rec(node: Any) -> Any:
        # A subtree that mirrors the params structure (optax mu/nu) gets
        # param-aware specs; anything else is handled per leaf.
        if pstruct is not None:
            try:
                if (
                    jax.tree.structure(node) == pstruct
                    and len(jax.tree.leaves(node)) == len(flat_specs)
                ):
                    return jax.tree.unflatten(
                        jax.tree.structure(node),
                        [
                            spec(leaf, base)
                            for leaf, base in zip(
                                jax.tree.leaves(node), flat_specs
                            )
                        ],
                    )
            except Exception:
                pass
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*(rec(child) for child in node))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(child) for child in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if hasattr(node, "ndim"):
            return spec(node)
        return node

    if pstruct is None:
        return jax.tree.map(spec, params)
    return rec(params)


def _legalize_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Replicate any spec axis the array's shape doesn't divide evenly
    (``device_put`` rejects uneven shardings). The engines assert the
    divisibility that matters (num_heads/d_ff vs TP degree), so the only
    leaves that ever land here are degenerate small tensors — e.g. a
    ``Quant4Weight`` per-group scale whose K/group rows collapse below the
    mesh size at toy geometry; replicating those is free."""
    names = tuple(spec) + (None,) * (len(shape) - len(tuple(spec)))
    out = []
    for dim, name in zip(shape, names):
        if name is None:
            out.append(None)
            continue
        size = 1
        for n in (name,) if isinstance(name, str) else name:
            size *= mesh.shape[n]
        out.append(name if dim % size == 0 else None)
    return P(*out)


def shard_pytree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """Place ``tree`` on ``mesh`` according to a matching spec pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _legalize_spec(s, x.shape, mesh))
        ),
        tree,
        specs,
    )
