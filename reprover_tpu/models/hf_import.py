"""HF T5 checkpoint import/export (local directories; no network).

The reference loads stock HF checkpoints (``google/byt5-small``,
``kaiyuy/leandojo-lean4-*``) via Transformers
(`/root/reference/retrieval/model.py:45`, `generation/model.py:87`) and
exports with ``save_pretrained`` (`scripts/convert_checkpoint.py:9-18`).
Here the HF layout (``model.safetensors`` or ``pytorch_model.bin`` +
``config.json``) is mapped to/from our stacked-layer pytree so both stock and
reference-finetuned weights load directly.

HF stores dense weights as ``[out, in]`` (torch ``Linear``); our layout is
``[in, out]`` (right-multiplication), so every dense weight is transposed on
the way through.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from reprover_tpu.models.t5 import Params, T5Config


def config_from_hf(hf_cfg: Mapping[str, Any], **overrides: object) -> T5Config:
    d = dict(
        vocab_size=hf_cfg["vocab_size"],
        d_model=hf_cfg["d_model"],
        d_kv=hf_cfg["d_kv"],
        d_ff=hf_cfg["d_ff"],
        num_heads=hf_cfg["num_heads"],
        num_encoder_layers=hf_cfg["num_layers"],
        num_decoder_layers=hf_cfg.get("num_decoder_layers", hf_cfg["num_layers"]),
        relative_attention_num_buckets=hf_cfg.get(
            "relative_attention_num_buckets", 32
        ),
        relative_attention_max_distance=hf_cfg.get(
            "relative_attention_max_distance", 128
        ),
        layer_norm_epsilon=hf_cfg.get("layer_norm_epsilon", 1e-6),
        tie_word_embeddings=hf_cfg.get("tie_word_embeddings", True),
        pad_token_id=hf_cfg.get("pad_token_id", 0),
        eos_token_id=hf_cfg.get("eos_token_id", 1),
        decoder_start_token_id=hf_cfg.get("decoder_start_token_id", 0),
    )
    d.update(overrides)
    return T5Config(**d)


def _load_state_dict(ckpt_dir: str) -> Dict[str, np.ndarray]:
    st_path = os.path.join(ckpt_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(ckpt_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin in {ckpt_dir}"
    )


def params_from_torch_state_dict(
    sd: Mapping[str, np.ndarray], cfg: T5Config, encoder_only: bool = False
) -> Params:
    """Map an HF T5 state dict to our stacked-layer pytree."""

    def g(name: str) -> np.ndarray:
        arr = np.asarray(sd[name])
        return arr.astype(np.float32) if arr.dtype != np.float32 else arr

    def dense(name: str) -> np.ndarray:
        return g(name).T  # [out,in] -> [in,out]

    def attn(prefix: str) -> Dict[str, np.ndarray]:
        return {x: dense(f"{prefix}.{x}.weight") for x in ("q", "k", "v", "o")}

    def mlp(prefix: str) -> Dict[str, np.ndarray]:
        return {
            x: dense(f"{prefix}.{x}.weight") for x in ("wi_0", "wi_1", "wo")
        }

    def stack(dicts):
        out = {}
        for key in dicts[0]:
            if isinstance(dicts[0][key], dict):
                out[key] = stack([d[key] for d in dicts])
            else:
                out[key] = jnp.asarray(np.stack([d[key] for d in dicts]))
        return out

    enc_layers = []
    for i in range(cfg.num_encoder_layers):
        b = f"encoder.block.{i}"
        enc_layers.append(
            {
                "attn": attn(f"{b}.layer.0.SelfAttention"),
                "attn_norm": g(f"{b}.layer.0.layer_norm.weight"),
                "mlp": mlp(f"{b}.layer.1.DenseReluDense"),
                "mlp_norm": g(f"{b}.layer.1.layer_norm.weight"),
            }
        )

    params: Params = {
        "shared_embedding": jnp.asarray(g("shared.weight")),
        "encoder": {
            "rel_bias": jnp.asarray(
                g("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")
            ),
            "layers": stack(enc_layers),
            "final_norm": jnp.asarray(g("encoder.final_layer_norm.weight")),
        },
    }

    if encoder_only:
        return params

    dec_layers = []
    for i in range(cfg.num_decoder_layers):
        b = f"decoder.block.{i}"
        dec_layers.append(
            {
                "self_attn": attn(f"{b}.layer.0.SelfAttention"),
                "self_norm": g(f"{b}.layer.0.layer_norm.weight"),
                "cross_attn": attn(f"{b}.layer.1.EncDecAttention"),
                "cross_norm": g(f"{b}.layer.1.layer_norm.weight"),
                "mlp": mlp(f"{b}.layer.2.DenseReluDense"),
                "mlp_norm": g(f"{b}.layer.2.layer_norm.weight"),
            }
        )

    params["decoder"] = {
        "rel_bias": jnp.asarray(
            g("decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")
        ),
        "layers": stack(dec_layers),
        "final_norm": jnp.asarray(g("decoder.final_layer_norm.weight")),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(dense("lm_head.weight"))
    return params


def load_hf_t5(
    ckpt_dir: str, encoder_only: bool = False, **config_overrides: object
) -> Tuple[Params, T5Config]:
    """Load a local HF T5/ByT5 checkpoint directory -> (params, config).

    ``encoder_only`` accepts both full seq2seq checkpoints and
    ``T5EncoderModel`` exports (the reference retriever saves encoder-only,
    `generation/model.py:225`).
    """
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, **config_overrides)
    sd = _load_state_dict(ckpt_dir)
    return params_from_torch_state_dict(sd, cfg, encoder_only=encoder_only), cfg


def export_hf_t5(
    params: Params, cfg: T5Config, out_dir: str, encoder_only: bool = False
) -> None:
    """Export our pytree to an HF-layout directory (safetensors + config.json).

    Replaces `scripts/convert_checkpoint.py` — artifacts load directly in HF
    Transformers for downstream consumers of the reference ecosystem.
    """
    os.makedirs(out_dir, exist_ok=True)
    sd: Dict[str, np.ndarray] = {}

    def put(name: str, arr) -> None:
        # safetensors serializes the raw buffer: views (e.g. transposes) must
        # be materialized contiguously or the file silently holds wrong data.
        sd[name] = np.ascontiguousarray(np.asarray(arr, dtype=np.float32))

    def put_dense(name: str, arr) -> None:
        put(name, np.asarray(arr, dtype=np.float32).T)

    put("shared.weight", params["shared_embedding"])
    put("encoder.embed_tokens.weight", params["shared_embedding"])

    def unstack(tree, i):
        import jax

        lp = jax.tree.map(lambda x: np.asarray(x[i]), tree)
        # Split a serving-fused gate|up projection back into HF layout
        # (t5.fuse_mlp_params is the inverse).
        mlp = lp.get("mlp")
        if mlp is not None and "wi" in mlp:
            half = mlp["wi"].shape[-1] // 2
            lp["mlp"] = {
                "wi_0": mlp["wi"][..., :half],
                "wi_1": mlp["wi"][..., half:],
                "wo": mlp["wo"],
            }
        return lp

    put(
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
        params["encoder"]["rel_bias"],
    )
    for i in range(cfg.num_encoder_layers):
        lp = unstack(params["encoder"]["layers"], i)
        b = f"encoder.block.{i}"
        for x in ("q", "k", "v", "o"):
            put_dense(f"{b}.layer.0.SelfAttention.{x}.weight", lp["attn"][x])
        put(f"{b}.layer.0.layer_norm.weight", lp["attn_norm"])
        for x in ("wi_0", "wi_1", "wo"):
            put_dense(f"{b}.layer.1.DenseReluDense.{x}.weight", lp["mlp"][x])
        put(f"{b}.layer.1.layer_norm.weight", lp["mlp_norm"])
    put("encoder.final_layer_norm.weight", params["encoder"]["final_norm"])

    if not encoder_only and "decoder" in params:
        put("decoder.embed_tokens.weight", params["shared_embedding"])
        put(
            "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            params["decoder"]["rel_bias"],
        )
        for i in range(cfg.num_decoder_layers):
            lp = unstack(params["decoder"]["layers"], i)
            b = f"decoder.block.{i}"
            for x in ("q", "k", "v", "o"):
                put_dense(f"{b}.layer.0.SelfAttention.{x}.weight", lp["self_attn"][x])
            put(f"{b}.layer.0.layer_norm.weight", lp["self_norm"])
            for x in ("q", "k", "v", "o"):
                put_dense(f"{b}.layer.1.EncDecAttention.{x}.weight", lp["cross_attn"][x])
            put(f"{b}.layer.1.layer_norm.weight", lp["cross_norm"])
            for x in ("wi_0", "wi_1", "wo"):
                put_dense(f"{b}.layer.2.DenseReluDense.{x}.weight", lp["mlp"][x])
            put(f"{b}.layer.2.layer_norm.weight", lp["mlp_norm"])
        put("decoder.final_layer_norm.weight", params["decoder"]["final_norm"])
        if not cfg.tie_word_embeddings:
            put_dense("lm_head.weight", params["lm_head"])

    from safetensors.numpy import save_file

    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    hf_cfg = {
        "architectures": [
            "T5EncoderModel" if encoder_only else "T5ForConditionalGeneration"
        ],
        "model_type": "t5",
        "vocab_size": cfg.vocab_size,
        "d_model": cfg.d_model,
        "d_kv": cfg.d_kv,
        "d_ff": cfg.d_ff,
        "num_heads": cfg.num_heads,
        "num_layers": cfg.num_encoder_layers,
        "num_decoder_layers": cfg.num_decoder_layers,
        "relative_attention_num_buckets": cfg.relative_attention_num_buckets,
        "relative_attention_max_distance": cfg.relative_attention_max_distance,
        "layer_norm_epsilon": cfg.layer_norm_epsilon,
        "feed_forward_proj": "gated-gelu",
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "pad_token_id": cfg.pad_token_id,
        "eos_token_id": cfg.eos_token_id,
        "decoder_start_token_id": cfg.decoder_start_token_id,
        "is_encoder_decoder": not encoder_only,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
