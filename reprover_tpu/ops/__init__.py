"""Fused device ops: pooling, masked top-k, attention kernels."""

from reprover_tpu.ops.pooling import masked_mean_normalize
from reprover_tpu.ops.topk import masked_topk, cosine_topk

__all__ = [
    "masked_mean_normalize",
    "masked_topk",
    "cosine_topk",
    "encoder_flash_attention",
    "causal_flash_attention",
    "cross_flash_attention",
    "scaled_causal_flash_attention",
    "ring_encoder_attention",
]


def __getattr__(name: str) -> object:
    # Lazy: the attention kernels import pallas / shard_map machinery.
    if name in (
        "encoder_flash_attention",
        "causal_flash_attention",
        "cross_flash_attention",
        "scaled_causal_flash_attention",
    ):
        from reprover_tpu.ops import flash_attention

        return getattr(flash_attention, name)
    if name == "ring_encoder_attention":
        from reprover_tpu.ops.ring_attention import ring_encoder_attention

        return ring_encoder_attention
    raise AttributeError(name)
