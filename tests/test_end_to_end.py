"""End-to-end pipeline on the toy corpus (SURVEY.md §4 item 6):

retriever fit -> predictions.pickle -> retrieval-augmented generator fit
(with the in-training prover Pass@1 validation hook against a fake Lean) ->
service-backed retrieval-augmented generation through the real tiny models.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_full_pipeline(toy_corpus_path, toy_dataset_dir, tmp_path):
    log_r = str(tmp_path / "retrieval")
    # ---- 1. retriever: 2-step fit + predict --------------------------- #
    from reprover_tpu.retrieval.main import main as rmain

    rargs = [
        "--model.tiny", "true",
        "--model.num_retrieved", "4",
        "--data.data_path", toy_dataset_dir,
        "--data.corpus_path", toy_corpus_path,
        "--data.batch_size", "2",
        "--data.eval_batch_size", "2",
        "--data.max_seq_len", "256",
        "--data.num_negatives", "2",
        "--data.num_in_file_negatives", "1",
        "--trainer.max_steps", "2",
        "--trainer.val_interval", "2",
        "--trainer.log_interval", "1",
        "--trainer.patience", "99",
        "--log_dir", log_r,
    ]
    rmain(["fit"] + rargs)
    rmain(["predict"] + rargs)
    preds_path = os.path.join(log_r, "predictions.pickle")
    assert os.path.exists(preds_path)

    # ---- 2. generator: fit with retrieval augmentation + Pass@1 hook --- #
    from reprover_tpu.generation import main as gmain_mod
    from reprover_tpu.prover import FakeEnvironment
    from reprover_tpu.utils.config import parse_config

    log_g = str(tmp_path / "generation")
    _, cfg = parse_config(
        gmain_mod.GenerationConfig,
        [
            "--model.tiny", "true",
            "--model.num_beams", "2",
            "--data.data_path", toy_dataset_dir,
            "--data.corpus_path", toy_corpus_path,
            "--data.preds_path", preds_path,
            "--data.batch_size", "2",
            "--data.eval_batch_size", "2",
            "--data.max_inp_seq_len", "256",
            "--data.max_oup_seq_len", "32",
            "--data.p_drop", "0.5",
            "--trainer.max_steps", "2",
            "--trainer.val_interval", "2",
            "--trainer.log_interval", "1",
            "--trainer.monitor", "loss_val",
            "--trainer.monitor_mode", "min",
            "--trainer.patience", "99",
            "--eval.num_theorems", "2",
            "--eval.num_sampled_tactics", "2",
            "--eval.timeout", "20",
            "--log_dir", log_g,
        ],
    )
    env = FakeEnvironment(
        init_states={"gcd_self": "n : ℕ\n⊢ gcd n n = n", "d_late": "⊢ 2 = 2"},
        transitions={},  # a random-weight model proves nothing — plumbing test
    )
    gmain_mod.run_fit(cfg, environment=env)

    with open(os.path.join(log_g, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    pass1 = [r["Pass@1_val"] for r in recs if "Pass@1_val" in r]
    assert pass1, "end-to-end Pass@1 hook did not run"
    assert pass1[-1] == 0.0  # both theorems searched, none provable
    assert any("top2_acc_val" in r for r in recs)

    # ---- 3. service-backed retrieval-augmented generation -------------- #
    import asyncio

    import jax

    from reprover_tpu.data import Pos
    from reprover_tpu.generation.generator import TacticGeneratorModel
    from reprover_tpu.models import init_params
    from reprover_tpu.models.t5 import T5Config
    from reprover_tpu.prover import InferenceService, RemoteTacticGenerator
    from reprover_tpu.retrieval import PremiseRetriever

    tiny = T5Config(
        d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=1,
    )
    gen_model = TacticGeneratorModel(
        init_params(jax.random.PRNGKey(0), tiny), tiny,
        max_inp_seq_len=256, max_oup_seq_len=16, bucket_multiple=32,
    )
    retriever = PremiseRetriever(
        init_params(jax.random.PRNGKey(1), tiny), tiny,
        max_seq_len=256, bucket_multiple=32,
    )
    from reprover_tpu.data import Corpus

    retriever.load_corpus(Corpus(toy_corpus_path))
    service = InferenceService(gen_model, retriever=retriever, max_num_retrieved=3)
    client = service.client()
    service.start()
    try:
        gen = RemoteTacticGenerator(client)
        cands = asyncio.run(
            gen.generate(
                "n : ℕ\n⊢ gcd n n = n", "d.lean", "gcd_self", Pos(5, 1), 2
            )
        )
        assert 1 <= len(cands) <= 2
        # scores are finite logprobs, descending
        scores = [s for _, s in cands]
        assert all(np.isfinite(scores))
        assert scores == sorted(scores, reverse=True)
    finally:
        service.stop()
