"""Full google/byt5-small-geometry parity vs HF torch (random weights, CPU).

Round-1 parity tests ran only at toy geometry (d_model 64, 3+2 layers); this
suite runs the geometry that actually ships — d_model 1472, d_kv 64, d_ff
3584, 6 heads, 12 encoder + 4 decoder layers, vocab 384 (~300M params,
`/root/reference/retrieval/model.py:45`) — at the reference sequence lengths:
retrieval encode at L=1024 (`retrieval/confs/cli_lean4_random.yaml:50`) and
generator-style beam search on a 2300-byte input padded to 2304
(`generation/confs/cli_lean4_random.yaml:56-57`). Real byt5-small weights are
not fetchable offline (attempted 2026-08-16: no egress), so the weights are
random — geometry, bucketing at long range, fp32-island placement, pooling,
fused-MLP layout, and export roundtrip are exactly the shipped code paths.

Beam width/decode length are reduced (4 beams, 24 steps) to keep HF-on-CPU
runtime sane; the score semantics they check are length-independent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reprover_tpu.models import encode, load_hf_t5
from reprover_tpu.models.t5 import fuse_mlp_params
from reprover_tpu.ops import masked_mean_normalize

pytestmark = pytest.mark.slow

VOCAB = 384
B = 2


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    cfg = HFT5Config(
        vocab_size=VOCAB,
        d_model=1472,
        d_kv=64,
        d_ff=3584,
        num_layers=12,
        num_decoder_layers=4,
        num_heads=6,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
        decoder_start_token_id=0,
    )
    model = T5ForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("hf_byt5_small_geom")
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


@pytest.fixture(scope="module")
def enc_batch():
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 259, size=(B, 1024)).astype(np.int32)
    mask = np.ones((B, 1024), dtype=np.int32)
    mask[1, 700:] = 0
    ids[mask == 0] = 0
    return ids, mask


def test_full_geometry_encoder_and_pooling_parity(hf_ckpt, enc_batch):
    """Encoder last-hidden + masked-mean+L2 embeddings at L=1024, 12 layers.

    Covers the retriever `_encode` contract (`retrieval/model.py:107-114`)
    at shipping geometry, through the fused-MLP serving layout.
    """
    import torch

    path, model = hf_ckpt
    ids, mask = enc_batch
    params, cfg = load_hf_t5(path, encoder_only=True)
    params = fuse_mlp_params(params)

    ours_hidden = np.asarray(
        encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    )
    ours_emb = np.asarray(
        masked_mean_normalize(jnp.asarray(ours_hidden), jnp.asarray(mask))
    )

    with torch.no_grad():
        theirs_hidden = model.encoder(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state
        m = torch.tensor(mask.astype(np.float32))[:, :, None]
        pooled = (theirs_hidden * m).sum(1) / m.sum(1)
        theirs_emb = (pooled / pooled.norm(dim=-1, keepdim=True)).numpy()
        theirs_hidden = theirs_hidden.numpy()

    np.testing.assert_allclose(
        ours_hidden[mask == 1], theirs_hidden[mask == 1], rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(ours_emb, theirs_emb, rtol=1e-4, atol=1e-5)


def test_full_geometry_beam_search_parity(hf_ckpt):
    """Beam search on a 2300-byte input (padded 2304): tokens + HF sequence
    scores (`prover/tactic_generator.py:213-224` semantics: length_penalty 0,
    do_sample False, early_stopping False)."""
    import torch

    path, model = hf_ckpt
    from reprover_tpu.generation import TacticGeneratorModel
    from reprover_tpu.tokenizer import ByT5Tokenizer

    rng = np.random.default_rng(1)
    text = "".join(chr(rng.integers(97, 123)) for _ in range(2300))
    tok = ByT5Tokenizer()
    batch = tok([text], max_length=2300)
    assert batch.input_ids.shape[1] == 2304  # 128-aligned padding

    num_beams, max_len = 4, 24
    gen = TacticGeneratorModel.load_hf(
        path, max_inp_seq_len=2300, max_oup_seq_len=max_len, length_penalty=0.0
    )
    ours = gen.generate([text], num_samples=num_beams, max_length=max_len)[0]

    # HF consumes the exactly-2300-length input; the 4 masked pad columns on
    # our side are inert so outputs must agree.
    with torch.no_grad():
        hf = model.generate(
            input_ids=torch.tensor(batch.input_ids[:, :2300].astype(np.int64)),
            attention_mask=torch.tensor(
                batch.attention_mask[:, :2300].astype(np.int64)
            ),
            max_length=max_len,
            num_beams=num_beams,
            num_return_sequences=num_beams,
            do_sample=False,
            length_penalty=0.0,
            early_stopping=False,
            output_scores=True,
            return_dict_in_generate=True,
        )
    hf_texts = [tok.decode(seq, skip_special_tokens=True) for seq in hf.sequences.numpy()]
    hf_scores = hf.sequences_scores.numpy()

    assert [t for t, _ in ours] == hf_texts
    np.testing.assert_allclose(
        [s for _, s in ours], hf_scores, rtol=1e-3, atol=1e-4
    )


def test_full_geometry_export_roundtrip_embeddings(hf_ckpt, enc_batch, tmp_path):
    """fused-MLP params -> HF export -> reimport: embeddings identical."""
    from reprover_tpu.models import export_hf_t5

    path, _ = hf_ckpt
    ids, mask = enc_batch
    params, cfg = load_hf_t5(path, encoder_only=True)
    fused = fuse_mlp_params(params)

    out_dir = str(tmp_path / "exported_full")
    export_hf_t5(fused, cfg, out_dir)
    reloaded, cfg2 = load_hf_t5(out_dir, encoder_only=True)

    a = masked_mean_normalize(
        encode(fused, cfg, jnp.asarray(ids), jnp.asarray(mask)), jnp.asarray(mask)
    )
    b = masked_mean_normalize(
        encode(reloaded, cfg2, jnp.asarray(ids), jnp.asarray(mask)),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
