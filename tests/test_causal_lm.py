"""Causal LM (LLaMA-family): logits parity vs HF torch, prefill/decode-step
consistency, HF beam-search generate parity, and the causal generator
wrapper (prompt handling, no echo)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reprover_tpu.models.causal_lm import (
    CausalLMConfig,
    decode_step,
    forward_logits,
    init_params,
    prefill,
)

TINY = dict(
    vocab_size=96,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,  # exercise GQA
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
    pad_token_id=0,
    max_position_embeddings=256,
)


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    """A tiny random HF LlamaForCausalLM saved to disk."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(**TINY)
    model = LlamaForCausalLM(cfg).eval()
    out = tmp_path_factory.mktemp("llama") / "ckpt"
    model.save_pretrained(str(out), safe_serialization=True)
    return str(out), model


@pytest.fixture(scope="module")
def ours(hf_ckpt):
    from reprover_tpu.models.hf_import_causal import load_hf_causal_lm

    path, _ = hf_ckpt
    return load_hf_causal_lm(path)


def test_logits_parity_with_hf(hf_ckpt, ours):
    import torch

    path, hf_model = hf_ckpt
    params, cfg = ours
    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size, (2, 12))
    # right-padding mask (HF forward convention)
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    ids[1, 9:] = cfg.pad_token_id

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    out = np.asarray(
        forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    )
    # compare on real tokens only
    np.testing.assert_allclose(out[0], ref[0], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(out[1, :9], ref[1, :9], atol=2e-4, rtol=2e-4)


def test_prefill_decode_matches_forward(ours):
    params, cfg = ours
    rng = np.random.default_rng(1)
    B, P = 2, 8
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, P)), jnp.int32)
    # LEFT padding
    mask = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1], [1] * 8], jnp.int32)
    ids = jnp.where(mask == 1, ids, cfg.pad_token_id)

    logits_full = forward_logits(params, cfg, ids, mask)
    logits_pre, state = prefill(params, cfg, ids, mask, max_decode_len=4)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, -1, :]), atol=1e-4, rtol=1e-4
    )

    # one decode step == extending the sequence by one token
    next_tok = jnp.asarray([5, 7], jnp.int32)
    step_logits, state = decode_step(params, cfg, state, next_tok)
    ids2 = jnp.concatenate([ids, next_tok[:, None]], axis=1)
    mask2 = jnp.concatenate([mask, jnp.ones((B, 1), jnp.int32)], axis=1)
    full2 = forward_logits(params, cfg, ids2, mask2)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full2[:, -1, :]), atol=1e-4, rtol=1e-4
    )


def test_generate_matches_hf_beam_search(hf_ckpt, ours):
    import torch

    path, hf_model = hf_ckpt
    params, cfg = ours
    from reprover_tpu.generation.causal_generator import CausalTacticGeneratorModel

    class IdsTokenizer:
        """Maps space-separated ints <-> token ids (no real vocab needed)."""

        def __call__(self, text, add_special_tokens=True):
            return {"input_ids": [int(t) for t in text.split()]}

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    model = CausalTacticGeneratorModel(
        params,
        cfg,
        IdsTokenizer(),
        max_inp_seq_len=32,
        max_oup_seq_len=8,
        template="%s",
        bucket_multiple=4,
    )

    prompts = [[5, 17, 29, 3], [11, 12]]
    num_beams = 3
    for prompt in prompts:
        ours_out = model.generate([" ".join(map(str, prompt))], num_beams)[0]

        with torch.no_grad():
            hf = hf_model.generate(
                input_ids=torch.tensor([prompt]),
                max_new_tokens=8,
                num_beams=num_beams,
                num_return_sequences=num_beams,
                do_sample=False,
                early_stopping=False,
                length_penalty=0.0,
                output_scores=True,
                return_dict_in_generate=True,
            )
        hf_texts = [
            " ".join(
                str(t)
                for t in seq[len(prompt):].tolist()
                if t not in (cfg.eos_token_id, cfg.pad_token_id)
            )
            for seq in hf.sequences
        ]
        hf_scores = hf.sequences_scores.tolist()
        assert [t for t, _ in ours_out] == hf_texts, (ours_out, hf_texts)
        np.testing.assert_allclose(
            [s for _, s in ours_out], hf_scores, atol=1e-3, rtol=1e-3
        )


def test_is_causal_lm_checkpoint(hf_ckpt, tmp_path):
    from reprover_tpu.models.hf_import_causal import is_causal_lm_checkpoint

    path, _ = hf_ckpt
    assert is_causal_lm_checkpoint(path)
    t5_dir = tmp_path / "t5"
    t5_dir.mkdir()
    (t5_dir / "config.json").write_text(
        json.dumps({"architectures": ["T5ForConditionalGeneration"]})
    )
    assert not is_causal_lm_checkpoint(str(t5_dir))
    assert not is_causal_lm_checkpoint(str(tmp_path / "missing"))


def test_flash_causal_training_parity(ours):
    """cfg.flash_attention routes the teacher-forced forward through the
    Pallas causal kernel (zero bias table, scale folded into q, key mask +
    causal handled in-kernel): logits and loss gradients must match the
    naive [B, H, T, T] path, with right-padding, at T % 128 == 0."""
    import dataclasses as dc

    from reprover_tpu.models.causal_lm import causal_lm_loss

    params, cfg = ours
    cfg_flash = dc.replace(cfg, flash_attention=True)
    rng = np.random.default_rng(7)
    B, T = 2, 128
    ids = rng.integers(3, cfg.vocab_size, (B, T))
    mask = np.ones((B, T), np.int32)
    mask[1, 100:] = 0
    ids[1, 100:] = cfg.pad_token_id
    ids, mask = jnp.asarray(ids, jnp.int32), jnp.asarray(mask)

    naive = forward_logits(params, cfg, ids, mask)
    flash = forward_logits(params, cfg_flash, ids, mask)
    np.testing.assert_allclose(
        np.asarray(flash[0]), np.asarray(naive[0]), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(flash[1, :100]), np.asarray(naive[1, :100]),
        atol=2e-4, rtol=2e-4,
    )

    labels = jnp.where(mask == 1, ids, -100)

    g_naive = jax.grad(
        lambda p: causal_lm_loss(p, cfg, ids, mask, labels)
    )(params)
    g_flash = jax.grad(
        lambda p: causal_lm_loss(p, cfg_flash, ids, mask, labels)
    )(params)
    flat_n, _ = jax.tree_util.tree_flatten_with_path(g_naive)
    flat_f = jax.tree_util.tree_leaves(g_flash)
    for (path, gn), gf in zip(flat_n, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=5e-4, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_causal_training_loss_decreases(ours):
    """In-framework decoder-only fine-tuning: loss drops, TP+DP mesh works."""
    import optax

    from reprover_tpu.models.causal_lm import causal_lm_loss
    from reprover_tpu.parallel import (
        causal_param_partition_specs,
        make_mesh,
        shard_pytree,
        zero_partition_specs,
    )
    from reprover_tpu.training import make_optimizer

    params, cfg = ours
    rng = np.random.default_rng(0)
    B, T = 4, 16
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    labels = jnp.asarray(ids)

    tx = make_optimizer(1e-3, 0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return causal_lm_loss(p, cfg, ids, mask, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    p = params
    for _ in range(5):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    # TP sharding specs map cleanly onto the param tree and a sharded
    # forward executes on a (2, 2) mesh.
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    specs = causal_param_partition_specs(params, model_parallel=True)
    sharded = shard_pytree(params, specs, mesh)
    out = forward_logits(sharded, cfg, ids, mask)
    assert np.isfinite(np.asarray(out)).all()
    # moment specs respect the TP axes
    ospecs = zero_partition_specs(opt_state, mesh, param_specs=specs)
    assert "model" in str(jax.tree.leaves(
        ospecs, is_leaf=lambda x: hasattr(x, "index")
    )[0:999])  # at least one moment keeps a model axis
