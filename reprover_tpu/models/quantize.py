"""Weight-only int8 quantization for serving.

Beam-search decode is weight-read bound: every token step streams all
decoder weights from HBM while the batch (beams) dimension is small. Storing
matmul weights as int8 with per-output-channel scales halves that traffic;
the dequant is a cheap post-matmul column scale —

    y = (x @ q) * scale        ==       x @ (q * scale)

so the int8 tensor feeds the MXU directly after an on-the-fly convert (XLA
keeps the converted tile in VMEM; HBM sees only int8). Quality: per-channel
weight-only int8 is near-lossless for T5-class models (tested: beam-search
outputs match the bf16 model on the tiny config).

Usage: ``params = quantize_t5_params(params)`` — matmul leaves become
:class:`QuantWeight`; ``models.t5`` consumes either representation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuantWeight:
    """int8 weight [..., I, O] + fp32 per-output-channel scale [..., 1, O].

    ``kernel_ok`` (static aux data) gates the Pallas w8a16 routing: set
    False when the weight is sharded over a TP mesh — a ``pallas_call``
    cannot be GSPMD-partitioned, so routing there would force XLA to
    all-gather the full weight every step. The XLA int8 path partitions
    like any dot."""

    q: jnp.ndarray
    scale: jnp.ndarray
    kernel_ok: bool = True

    def tree_flatten(self) -> tuple[tuple[jnp.ndarray, jnp.ndarray], bool]:
        return ((self.q, self.scale), self.kernel_ok)

    @classmethod
    def tree_unflatten(cls, aux: bool, children: tuple) -> "QuantWeight":
        return cls(*children, kernel_ok=aux)

    @property
    def ndim(self) -> int:  # structural compat with array leaves
        return self.q.ndim

    @property
    def shape(self) -> tuple[int, ...]:
        return self.q.shape


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Quant4Weight(QuantWeight):
    """Packed int4 weight + per-K-group scales (w4a16 serving).

    ``q``: uint8 ``[..., K/2, O]`` — two 4-bit two's-complement values per
    byte along the contraction axis (low nibble = even row). ``scale``: fp32
    ``[..., K/group, O]`` — scales vary along K, so dequant applies them
    BEFORE the dot (the int8 class's post-dot column scale no longer
    factors out). Subclassing :class:`QuantWeight` keeps the models'
    ``isinstance(w, QuantWeight)`` dispatch untouched.

    Quarter-size weights are the lever that turns the int8 story's
    "7B-class on one 16 GB chip" into **13B-class on one chip** (the role
    of vLLM's 4-bit options, `/root/reference/prover/proof_search.py:332-366`).
    """

    group: int = 128

    def tree_flatten(
        self,
    ) -> tuple[tuple[jnp.ndarray, jnp.ndarray], tuple[bool, int]]:
        return ((self.q, self.scale), (self.kernel_ok, self.group))

    @classmethod
    def tree_unflatten(
        cls, aux: tuple[bool, int], children: tuple
    ) -> "Quant4Weight":
        kernel_ok, group = aux
        return cls(*children, kernel_ok=kernel_ok, group=group)


def resolve_quantize_bits(quantize: "bool | str") -> int:
    """Map the user-facing ``quantize`` flag to a bit width, strictly.

    ``True`` / ``"int8"`` -> 8 (w8a16), ``"int4"`` -> 4 (w4a16). Anything
    else (``"INT4"``, ``"w4a16"``, ``"int16"`` typos) raises instead of
    silently serving int8 — all serving entry points share this gate."""
    if quantize is True or quantize == "int8":
        return 8
    if quantize == "int4":
        return 4
    raise ValueError(
        f"quantize must be one of True, 'int8', 'int4'; got {quantize!r}"
    )


def _group_for(k: int, group: int) -> int:
    """Largest group size <= the requested one that divides K (halving —
    model dims are even; e.g. byt5's d_model 1472 lands on 64).

    For K > 2048 the Pallas w4a16 kernel blocks the contraction axis, and
    its scale tile needs ``(K-block / group) % 8 == 0`` (TPU sublane rule),
    so the group must additionally satisfy ``K % (8*group) == 0`` — e.g.
    LLaMA-13B's d_ff 13824 lands on 64 where 128 would leave no legal
    K block. K <= 2048 uses a whole-K tile, where only ``K % group == 0``
    matters."""
    g = min(group, k)
    if k > 2048:
        while g > 1 and k % (8 * g):
            g //= 2
    else:
        while g > 1 and k % g:
            g //= 2
    return max(g, 1)


def quantize_weight4(
    w: jnp.ndarray, group: int = 128, kernel_ok: bool = True
) -> Quant4Weight:
    """Symmetric int4 with per-(K-group, output-channel) scales; packs two
    values per byte along K. Leading axes (stacked layers) quantize
    independently through the group reshape."""
    w32 = jnp.asarray(w, jnp.float32)
    *lead, k, o = w32.shape
    assert k % 2 == 0, f"odd contraction dim {k} cannot pack int4 pairs"
    g = _group_for(k, group)
    grp = w32.reshape(*lead, k // g, g, o)
    absmax = jnp.max(jnp.abs(grp), axis=-2, keepdims=True)  # [..., K/g, 1, O]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(grp / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(*lead, k, o)
    pairs = q.reshape(*lead, k // 2, 2, o)
    low, high = pairs[..., 0, :], pairs[..., 1, :]
    packed = ((low & 15) | ((high & 15) << 4)).astype(jnp.uint8)
    return Quant4Weight(
        q=packed, scale=scale[..., 0, :], kernel_ok=kernel_ok, group=g
    )


def dequantize4(
    w: Quant4Weight, dtype: jnp.dtype = jnp.float32
) -> jnp.ndarray:
    """[..., K, O] reconstruction in ``dtype`` (the XLA serving path and
    the pack/unpack round-trip oracle for tests). Serving passes bf16 so
    the materialized dequant temp is half the fp32 one — under TP (where
    the Pallas kernel is off) that temp is the per-layer HBM cost."""
    from reprover_tpu.ops.quant_matmul import unpack_int4

    w_int = unpack_int4(w.q)  # [..., K, O] int32
    *lead, k, o = w_int.shape
    s = w.scale[..., :, None, :]  # [..., K/g, 1, O]
    s_full = jnp.broadcast_to(
        s, (*lead, k // w.group, w.group, o)
    ).reshape(*lead, k, o)
    return (w_int.astype(jnp.float32) * s_full).astype(dtype)


def quantize_weight(w: jnp.ndarray, kernel_ok: bool = True) -> QuantWeight:
    """Per-output-channel symmetric int8 (output = last axis; leading axes,
    e.g. the stacked-layer axis, quantize independently)."""
    w32 = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # [..., 1, O]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantWeight(q=q, scale=scale, kernel_ok=kernel_ok)


# Kernel-routing thresholds (see :func:`quantized_dense`). byt5-small's
# largest weight is d_model*d_ff = 1472*3584 = 5.3 MB — below the cutoff,
# so byt5 serving keeps the XLA path its v5e measurement validated; a
# LLaMA-7B projection (4096*11008 = 45 MB) or lm_head (4096*32000 = 131 MB)
# routes through the kernel, where the int8 HBM read is the win.
_KERNEL_MIN_WEIGHT_BYTES = 16 * 2 ** 20
# The kernel holds all of x in VMEM (plus a double-buffered int8 weight
# tile): 32 MB leaves ample headroom in v5e's 128 MB VMEM and admits the
# big-engine decode activation (512 rows x 11008 cols bf16 = 11.3 MB).
_KERNEL_MAX_X_BYTES = 32 * 2 ** 20

#: Trace-time override for the kernel routing: ``None`` routes TPU-backend
#: traces only (the measured default); ``True``/``False`` force it — used
#: by the chipless AOT compile check (traces on the CPU backend FOR a TPU
#: target) and by ablation benchmarks.
FORCE_KERNEL: "bool | None" = None


def _use_kernel(x: jnp.ndarray, w: QuantWeight, dtype: jnp.dtype) -> bool:
    if not w.kernel_ok:
        return False  # TP-sharded weight: pallas_call can't be partitioned
    if w.q.ndim != 2:
        return False  # stacked-layer weights are consumed via lax.scan slices
    k, n = w.q.shape
    m = 1
    for s in x.shape[:-1]:
        m *= int(s)
    if not (
        k * n >= _KERNEL_MIN_WEIGHT_BYTES
        and m * k * jnp.dtype(dtype).itemsize <= _KERNEL_MAX_X_BYTES
    ):
        return False
    if FORCE_KERNEL is not None:
        return FORCE_KERNEL
    return jax.default_backend() == "tpu"


def _kernel_matmul(
    x: jnp.ndarray, w: QuantWeight, dtype: jnp.dtype, out_dtype: jnp.dtype
) -> jnp.ndarray:
    """Route through the Pallas w8a16 kernel (collapse leading axes)."""
    from reprover_tpu.ops.quant_matmul import quant_matmul

    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= int(s)
    y = quant_matmul(
        x.reshape(m, x.shape[-1]).astype(dtype),
        w.q,
        w.scale.reshape(-1),
        out_dtype=out_dtype,
    )
    return y.reshape(*lead, y.shape[-1])


def _use_kernel4(x: jnp.ndarray, w: "Quant4Weight", dtype: jnp.dtype) -> bool:
    if not w.kernel_ok or w.q.ndim != 2:
        return False
    kp, n = w.q.shape
    m = 1
    for s in x.shape[:-1]:
        m *= int(s)
    # same routing semantics as int8: kernel for >=16M-parameter weights
    # with a VMEM-resident activation
    if not (
        kp * 2 * n >= _KERNEL_MIN_WEIGHT_BYTES
        and m * kp * 2 * jnp.dtype(dtype).itemsize <= _KERNEL_MAX_X_BYTES
    ):
        return False
    # K > 2048 with no legal contraction block (K % cand or the sublane
    # rule cand % (8*group) fails for every candidate): the kernel would
    # fall back to a whole-K tile whose materialized int32 unpack blows
    # scoped VMEM at this size — route to the XLA dequant path instead of
    # emitting a kernel that may fail to compile.
    from reprover_tpu.ops.quant_matmul import _block_k4

    if kp * 2 > 2048 and _block_k4(kp * 2, w.group) > 2048:
        return False
    if FORCE_KERNEL is not None:
        return FORCE_KERNEL
    return jax.default_backend() == "tpu"


def _quant4_apply(
    x: jnp.ndarray, w: "Quant4Weight", dtype: jnp.dtype, out_dtype: jnp.dtype
) -> jnp.ndarray:
    if _use_kernel4(x, w, dtype):
        from reprover_tpu.ops.quant_matmul import quant4_matmul

        lead = x.shape[:-1]
        m = 1
        for s in lead:
            m *= int(s)
        y = quant4_matmul(
            x.reshape(m, x.shape[-1]).astype(dtype),
            w.q,
            w.scale,
            group=w.group,
            out_dtype=out_dtype,
        )
        return y.reshape(*lead, y.shape[-1])
    y = jnp.dot(
        x.astype(dtype),
        dequantize4(w, dtype),
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)


def quantized_dense(x: jnp.ndarray, w: QuantWeight, dtype: jnp.dtype) -> jnp.ndarray:
    """y = (x @ int8) * scale, fp32 accumulation.

    Two lowerings, chosen at trace time from static shapes:

    - **XLA** (default): ``x @ wq.astype(dtype)``. XLA materializes the
      converted weight, so HBM traffic is int8 + a bf16 copy. Measured on
      v5e at byt5-small shapes this ties bf16 decode latency — per-token
      matmuls there are too small for bandwidth to dominate — so at small
      scale int8 is purely a 2x weight-memory option.
    - **Pallas w8a16** (:mod:`reprover_tpu.ops.quant_matmul`) for large 2-D
      weights with a small activation footprint (the 7B-class serving
      regime, where the weight stream bounds the step): the int8 tile is
      DMA'd from HBM, converted in VMEM, and fed to the MXU — HBM sees
      half the weight bytes.
    """
    if isinstance(w, Quant4Weight):
        return _quant4_apply(x, w, dtype, out_dtype=dtype)
    if _use_kernel(x, w, dtype):
        return _kernel_matmul(x, w, dtype, out_dtype=dtype)
    y = jnp.dot(
        x.astype(dtype),
        w.q.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return (y * w.scale[..., 0, :].astype(jnp.float32)).astype(dtype)


def quantized_logits(x: jnp.ndarray, w: QuantWeight, dtype: jnp.dtype) -> jnp.ndarray:
    """Vocab projection variant of :func:`quantized_dense`: returns **fp32**
    logits (softmax islands stay full precision) instead of casting back to
    the compute dtype. Same kernel-routing rule."""
    if isinstance(w, Quant4Weight):
        return _quant4_apply(x, w, dtype, out_dtype=jnp.float32)
    if _use_kernel(x, w, dtype):
        return _kernel_matmul(x, w, dtype, out_dtype=jnp.float32)
    y = jnp.dot(
        x.astype(dtype), w.q.astype(dtype), preferred_element_type=jnp.float32
    )
    return y * w.scale[..., 0, :].astype(jnp.float32)


def has_xla_int4(tree: Any) -> bool:
    """True when ``tree`` holds :class:`Quant4Weight` leaves that will take
    the XLA dequant path (``kernel_ok=False`` — i.e. TP-sharded serving).

    Engines use this to keep the decode layer scan ROLLED: with
    ``unroll=True`` each unrolled layer's dequant temp is a distinct
    simultaneously-live HBM buffer (measured chipless at 13B TP=2:
    32.3 GB of per-layer dequant temps vs 15.75 GB HBM), while a rolled
    scan reuses one layer's worth."""
    found = False

    def rec(node):
        nonlocal found
        if isinstance(node, dict):
            for v in node.values():
                rec(v)
        elif isinstance(node, Quant4Weight) and not node.kernel_ok:
            found = True

    rec(tree)
    return found


_T5_MATMUL_KEYS = frozenset(
    {"q", "k", "v", "o", "wi_0", "wi_1", "wi", "wo", "lm_head"}
)

_CAUSAL_MATMUL_KEYS = frozenset(
    {"q", "k", "v", "o", "gate", "up", "down", "lm_head"}
)


def _quantize_tree(
    params: Any, keys: frozenset, kernel_ok: bool = True, bits: int = 8
) -> Any:
    assert bits in (8, 4), bits

    def rec(node, key=None):
        if isinstance(node, dict):
            return {k: rec(v, k) for k, v in node.items()}
        if isinstance(node, QuantWeight):  # idempotent
            return node
        if key in keys and hasattr(node, "ndim") and node.ndim >= 2:
            if bits == 4:
                return quantize_weight4(node, kernel_ok=kernel_ok)
            return quantize_weight(node, kernel_ok=kernel_ok)
        return node

    return rec(params)


def quantize_t5_params(
    params: Any, kernel_ok: bool = True, bits: int = 8
) -> Any:
    """Quantize every T5 matmul weight (attention/MLP/lm_head); norms,
    embeddings, and relative-position biases stay in full precision.
    ``kernel_ok=False`` when the tree will be TP-sharded (see
    :class:`QuantWeight`). ``bits=4`` packs int4 with per-group scales
    (:class:`Quant4Weight`)."""
    return _quantize_tree(params, _T5_MATMUL_KEYS, kernel_ok, bits)


def quantize_causal_params(
    params: Any, kernel_ok: bool = True, bits: int = 8
) -> Any:
    """Quantize every LLaMA-family matmul weight (attention q/k/v/o,
    SwiGLU gate/up/down, lm_head); the token embedding, RMSNorm scales,
    and — under ``tie_word_embeddings`` — the tied output projection stay
    in full precision. int8 weights halve the serving footprint: a
    7B-class decoder (13.5 GB bf16) fits a single 16 GB v5e chip with room
    for the engine's KV caches (role of vLLM's quantization options,
    `/root/reference/prover/proof_search.py:332-366`); ``bits=4`` quarters
    the weight stream, lifting that to 13B-class on one chip."""
    return _quantize_tree(params, _CAUSAL_MATMUL_KEYS, kernel_ok, bits)
