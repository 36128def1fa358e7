"""Golden parity: our functional JAX T5 vs HF torch T5 (random small weights).

The real byt5-small weights are not fetchable offline; instead a small
random-weight ``T5ForConditionalGeneration`` with ByT5-style config
(gated-GELU, untied embeddings, inner_dim != d_model) is saved locally and
imported — this exercises exactly the code path used for real checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reprover_tpu.models import (
    cross_entropy_loss,
    decode,
    decode_step,
    encode,
    init_decode_state,
    load_hf_t5,
    export_hf_t5,
    shift_right,
)

VOCAB = 384
B, SRC, TGT = 3, 17, 9


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    cfg = HFT5Config(
        vocab_size=VOCAB,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=3,
        num_decoder_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
        decoder_start_token_id=0,
    )
    model = T5ForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("hf_t5")
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(42)
    input_ids = rng.integers(3, 259, size=(B, SRC)).astype(np.int32)
    mask = np.ones((B, SRC), dtype=np.int32)
    mask[1, 12:] = 0
    mask[2, 7:] = 0
    input_ids[mask == 0] = 0
    labels = rng.integers(3, 259, size=(B, TGT)).astype(np.int64)
    labels[1, 6:] = -100
    return input_ids, mask, labels


def test_encoder_parity(hf_ckpt, batch):
    import torch

    path, model = hf_ckpt
    input_ids, mask, _ = batch
    params, cfg = load_hf_t5(path)
    ours = np.asarray(encode(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask)))
    with torch.no_grad():
        theirs = (
            model.encoder(
                input_ids=torch.tensor(input_ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        )
    # Only compare non-padded positions (HF computes garbage at padded
    # query positions too, but they are masked downstream).
    np.testing.assert_allclose(
        ours[mask == 1], theirs[mask == 1], rtol=2e-4, atol=2e-5
    )


def test_seq2seq_logits_and_loss_parity(hf_ckpt, batch):
    import torch

    path, model = hf_ckpt
    input_ids, mask, labels = batch
    params, cfg = load_hf_t5(path)

    enc = encode(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask))
    dec_in = shift_right(jnp.asarray(labels.astype(np.int32)), cfg)
    logits = decode(params, cfg, enc, jnp.asarray(mask), dec_in)
    loss = cross_entropy_loss(logits, jnp.asarray(labels.astype(np.int32)))

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(input_ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            labels=torch.tensor(labels),
        )
    np.testing.assert_allclose(
        np.asarray(logits), out.logits.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(loss), float(out.loss), rtol=1e-4)


def test_incremental_decode_matches_full(hf_ckpt, batch):
    """KV-cache decode_step must agree with full teacher-forced decode."""
    path, _ = hf_ckpt
    input_ids, mask, _ = batch
    params, cfg = load_hf_t5(path)

    enc = encode(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask))
    rng = np.random.default_rng(7)
    dec_ids = jnp.asarray(rng.integers(3, 259, size=(B, TGT)).astype(np.int32))
    full_logits = decode(params, cfg, enc, jnp.asarray(mask), dec_ids)

    state = init_decode_state(params, cfg, enc, jnp.asarray(mask), max_decode_len=TGT)
    step_fn = jax.jit(lambda s, t: decode_step(params, cfg, s, t))
    inc = []
    for t in range(TGT):
        logits, state = step_fn(state, dec_ids[:, t])
        inc.append(np.asarray(logits))
    inc_logits = np.stack(inc, axis=1)
    np.testing.assert_allclose(
        inc_logits, np.asarray(full_logits), rtol=2e-4, atol=2e-4
    )


def test_greedy_generation_parity(hf_ckpt, batch):
    """Greedy argmax rollout through decode_step matches HF generate."""
    import torch

    path, model = hf_ckpt
    input_ids, mask, _ = batch
    params, cfg = load_hf_t5(path)
    max_len = 12

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(input_ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            max_length=max_len,
            num_beams=1,
            do_sample=False,
        ).numpy()

    enc = encode(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask))
    state = init_decode_state(params, cfg, enc, jnp.asarray(mask), max_decode_len=max_len)
    step_fn = jax.jit(lambda s, t: decode_step(params, cfg, s, t))
    token = jnp.full((B,), cfg.decoder_start_token_id, jnp.int32)
    ours = [token]
    done = np.zeros(B, bool)
    for _ in range(max_len - 1):
        logits, state = step_fn(state, token)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        token = jnp.where(jnp.asarray(done), cfg.pad_token_id, token)
        ours.append(token)
        done |= np.asarray(token) == cfg.eos_token_id
    ours = np.stack([np.asarray(t) for t in ours], axis=1)
    np.testing.assert_array_equal(ours[:, : hf_out.shape[1]], hf_out)


def test_export_roundtrip(hf_ckpt, tmp_path, batch):
    """export_hf_t5 artifacts reload in HF Transformers with equal outputs."""
    import torch
    from transformers import T5ForConditionalGeneration

    path, model = hf_ckpt
    input_ids, mask, labels = batch
    params, cfg = load_hf_t5(path)
    out_dir = str(tmp_path / "exported")
    export_hf_t5(params, cfg, out_dir)
    reloaded = T5ForConditionalGeneration.from_pretrained(out_dir).eval()
    with torch.no_grad():
        a = model(
            input_ids=torch.tensor(input_ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            labels=torch.tensor(labels),
        ).logits.numpy()
        b = reloaded(
            input_ids=torch.tensor(input_ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            labels=torch.tensor(labels),
        ).logits.numpy()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_encoder_only_import(hf_ckpt, batch):
    path, _ = hf_ckpt
    input_ids, mask, _ = batch
    params, cfg = load_hf_t5(path, encoder_only=True)
    assert "decoder" not in params
    out = encode(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask))
    assert out.shape == (B, SRC, cfg.d_model)


def test_shift_right():
    from reprover_tpu.models.t5 import T5Config

    cfg = T5Config()
    labels = jnp.asarray([[5, 6, 1], [7, -100, -100]], jnp.int32)
    shifted = shift_right(labels, cfg)
    np.testing.assert_array_equal(
        np.asarray(shifted), [[0, 5, 6], [0, 7, 0]]
    )


def test_fused_mlp_params_numerics():
    """fuse_mlp_params is a pure layout change: encode/decode identical."""
    import numpy as np

    from reprover_tpu.models.t5 import (
        T5Config,
        decode,
        encode,
        fuse_mlp_params,
        init_params,
        shift_right,
    )

    cfg = T5Config(
        d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=2,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    fused = fuse_mlp_params(params)
    assert "wi" in fused["encoder"]["layers"]["mlp"]
    assert "wi_0" not in fused["encoder"]["layers"]["mlp"]

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32)
    labels = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 8)), jnp.int32)
    dec_in = shift_right(labels, cfg)

    a = decode(params, cfg, encode(params, cfg, ids, mask), mask, dec_in)
    b = decode(fused, cfg, encode(fused, cfg, ids, mask), mask, dec_in)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_fused_params_export_roundtrip(tmp_path):
    """Serving-fused params export to HF split layout and reload identically."""
    import numpy as np

    from reprover_tpu.models.hf_import import export_hf_t5, load_hf_t5
    from reprover_tpu.models.t5 import (
        T5Config,
        encode,
        fuse_mlp_params,
        init_params,
    )

    cfg = T5Config(
        d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=2,
    )
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(3), cfg))
    out = str(tmp_path / "hf")
    export_hf_t5(params, cfg, out)
    reloaded, cfg2 = load_hf_t5(out)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    a = np.asarray(encode(params, cfg, ids, mask))
    b = np.asarray(encode(reloaded, cfg2, ids, mask))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
