"""Functional JAX T5 (ByT5) models + HF checkpoint import/export."""

from reprover_tpu.models.t5 import (
    T5Config,
    byt5_small,
    init_params,
    encode,
    decode,
    decode_step,
    init_decode_state,
    shift_right,
    cross_entropy_loss,
)
from reprover_tpu.models.hf_import import (
    load_hf_t5,
    export_hf_t5,
    params_from_torch_state_dict,
)

__all__ = [
    "T5Config",
    "byt5_small",
    "init_params",
    "encode",
    "decode",
    "decode_step",
    "init_decode_state",
    "shift_right",
    "cross_entropy_loss",
    "load_hf_t5",
    "export_hf_t5",
    "params_from_torch_state_dict",
]
