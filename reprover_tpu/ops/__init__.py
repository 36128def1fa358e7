"""Fused device ops: pooling, masked top-k, attention kernels."""

from reprover_tpu.ops.pooling import masked_mean_normalize
from reprover_tpu.ops.topk import masked_topk, cosine_topk

__all__ = ["masked_mean_normalize", "masked_topk", "cosine_topk"]
