"""In-framework decoder-only pipeline: trainable BPE tokenizer +
causal generator datamodule + validation (the reference exports this
family to LLaMA-Factory, `/root/reference/generation/preprocess.py:30-37`;
here it trains and evaluates in-process)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reprover_tpu.generation.bpe_tokenizer import (
    TacticBpeTokenizer,
    train_tactic_tokenizer,
)


@pytest.fixture(scope="module")
def tok():
    texts = [
        "theorem lem_1 (x y : Nat) : x + (y * z) = (x + y) * add_3 z := by synth",
        "case syn_1_0\nx y z u v w : Nat\n⊢ x3 ⊓ (y1 ∘ z2) = (x3 ⊓ y1) ∘ sup_41 z2",
        "rw [lem_2_ab3f]",
        "n : Nat\n⊢ n + 0 = n",
    ]
    return train_tactic_tokenizer(texts * 4, vocab_size=512)


class TestTacticBpeTokenizer:
    def test_roundtrip_exact(self, tok):
        # exactness is load-bearing: the replay environment matches tactics
        # by exact string
        for text in (
            "rw [lem_9_ffff]",
            "case syn_3_1\nx y : Nat\n⊢ x9 ⊔ y0 = q7",
            "[GOAL]\nA!@#$%^&*() ⊢ B\n[PROOFSTEP]\n",
            "have h : a\t= b := rfl",
        ):
            ids = tok(text)["input_ids"]
            assert tok.decode(ids) == text

    def test_special_ids(self, tok):
        assert (tok.pad_token_id, tok.unk_token_id) == (0, 1)
        assert (tok.eos_token_id, tok.bos_token_id) == (2, 3)
        # decode skips specials
        ids = tok("rw [x]")["input_ids"]
        assert tok.decode([tok.eos_token_id] + ids + [tok.pad_token_id]) == "rw [x]"

    def test_save_load(self, tok, tmp_path):
        p = str(tmp_path / "bpe.vocab")
        tok.save(p)
        tok2 = TacticBpeTokenizer.load(p)
        t = "case x\n⊢ a ⊓ b = c"
        assert tok2(t)["input_ids"] == tok(t)["input_ids"]
        assert tok2.vocab_size == tok.vocab_size

    def test_hf_surface(self, tok):
        # the contract CausalTacticGeneratorModel._tokenize relies on
        out = tok("rw [x]", add_special_tokens=True)
        assert isinstance(out["input_ids"], list)
        assert tok.batch_decode([out["input_ids"]]) == ["rw [x]"]


def _write_dataset(root):
    os.makedirs(f"{root}/random", exist_ok=True)
    thms = []
    for t in range(6):
        state = f"case c{t}\nx y : Nat\n⊢ x{t} + y = goal_{t}"
        thms.append(
            {
                "url": "u",
                "commit": "c",
                "file_path": f"Syn/F{t % 2}.lean",
                "full_name": f"Syn.thm_{t}",
                "start": [1, 1],
                "end": [3, 1],
                "traced_tactics": [
                    {
                        "tactic": f"rw [lem_{t}]",
                        "annotated_tactic": [f"rw [lem_{t}]", []],
                        "state_before": state,
                        "state_after": "no goals",
                    }
                ],
            }
        )
    for split in ("train", "val"):
        with open(f"{root}/random/{split}.json", "w") as f:
            json.dump(thms, f)
    return f"{root}/random"


class TestCausalGeneratorDataModule:
    @pytest.fixture(scope="class")
    def dm(self, tok, tmp_path_factory):
        from reprover_tpu.generation.causal_datamodule import (
            CausalGeneratorDataModule,
        )

        root = str(tmp_path_factory.mktemp("causal_dm"))
        data = _write_dataset(root)
        dm = CausalGeneratorDataModule(
            data_path=data, tokenizer=tok, batch_size=3, eval_batch_size=3,
            max_seq_len=128, p_drop=0.0,
        )
        dm.setup("fit")
        return dm

    def test_batch_shapes_and_masking(self, dm, tok):
        b = next(iter(dm.train_dataloader()))
        ids, mask, labels = b["input_ids"], b["attention_mask"], b["labels"]
        assert ids.shape == mask.shape == labels.shape
        assert ids.shape[1] % 128 == 0
        assert (labels[mask == 0] == -100).all()
        for i in range(ids.shape[0]):
            pos = np.where(labels[i] != -100)[0]
            # labels are exactly the target tokens + EOS, aligned with ids
            assert labels[i, pos[-1]] == tok.eos_token_id
            assert (ids[i, pos] == labels[i, pos]).all()
            # prompt region carries no loss
            assert (labels[i, : pos[0]] == -100).all()

    def test_prompt_matches_serving_template(self, dm, tok):
        """The skew guard: the prompt tokens must decode to exactly
        TEMPLATE % state — the string the serving path encodes."""
        from reprover_tpu.generation.preprocess import TEMPLATE

        b = next(iter(dm.val_dataloader()))
        for i in range(len(b["state"])):
            pos = np.where(b["labels"][i] != -100)[0]
            prompt = tok.decode(b["input_ids"][i, : pos[0]].tolist())
            assert prompt == TEMPLATE % b["state"][i]
            tactic = tok.decode(b["labels"][i, pos].tolist())
            assert tactic == b["tactic"][i]

    def test_loss_and_validation(self, dm, tok):
        from reprover_tpu.generation.causal_generator import (
            CausalTacticGeneratorModel,
        )
        from reprover_tpu.generation.validate import causal_validation_metrics
        from reprover_tpu.models import causal_lm

        V = ((tok.vocab_size + 127) // 128) * 128
        cfg = causal_lm.CausalLMConfig(
            vocab_size=V, d_model=32, num_layers=2, num_heads=4,
            num_kv_heads=2, d_ff=64,
        )
        params = causal_lm.init_params(jax.random.PRNGKey(0), cfg)
        b = next(iter(dm.train_dataloader()))
        loss = causal_lm.causal_lm_loss(
            params, cfg,
            jnp.asarray(b["input_ids"]), jnp.asarray(b["attention_mask"]),
            jnp.asarray(b["labels"]),
        )
        assert np.isfinite(float(loss))
        model = CausalTacticGeneratorModel(
            params, cfg, tok, max_inp_seq_len=128, max_oup_seq_len=8,
        )
        m = causal_validation_metrics(
            model, dm.val_dataloader(), num_beams=2, limit_batches=1
        )
        assert np.isfinite(m["loss_val"]) and "top1_acc_val" in m
