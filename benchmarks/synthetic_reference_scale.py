"""Reference-scale quality run: train -> R@k/MRR curve -> RAG generator -> Pass@1.

The real LeanDojo Benchmark 4 is not fetchable offline, so this drives the
FULL pipeline on a synthetic benchmark at the reference's shape — ~129k
premises over 3000 files (`scripts/download_data.py` scale), Mathlib-like
premise lengths, 1-5 step proofs — answering "does the recipe converge?"
(VERDICT round-1 item 2):

1. retriever fine-tune at the reference data config (seq 1024, bs 8, 3
   negatives / 1 in-file, num_retrieved 100), logging the R@1/R@10/MRR
   curve at checkpoints;
2. retrieval prediction over train+val (predictions.pickle schema);
3. retrieval-augmented generator fine-tune (premises packed into the state,
   p_drop 0.5 — `generation/confs/cli_lean4_random.yaml`);
4. best-first proof search with the trained RAG generator on the replay
   environment -> Pass@1.

Model geometry is the from-scratch-learnable size (d_model 256, 4+4 layers):
training byt5-small (300M) from *random init* collapses early (no pretrained
weights offline — see BASELINE.md round-1 note); the pipeline/config knobs
are otherwise the reference's.

Run (one v5e, ~1h):  PYTHONPATH=. python benchmarks/synthetic_reference_scale.py
"""

import argparse
import dataclasses
import json
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_ap = argparse.ArgumentParser()
_ap.add_argument("--retr-steps", type=int, default=4000)
_ap.add_argument("--gen-steps", type=int, default=4000)
_ap.add_argument("--eval-every", type=int, default=1000)
_ap.add_argument("--retriever-only", action="store_true",
                 help="stop after the retriever R@k/MRR curve")
_ap.add_argument("--lr", type=float, default=3e-4)
_ap.add_argument("--loss", choices=["mse", "infonce"], default="mse")
_ap.add_argument("--root", default="/tmp/synth_ref_scale")
_ap.add_argument("--init-hf", default=None,
                 help="HF-layout dir (e.g. a span-corruption pretraining "
                 "export) to initialize the retriever from, instead of "
                 "random init — the reference's pretrained-byt5 role")
_ARGS = _ap.parse_args() if __name__ == "__main__" else _ap.parse_args([])

ROOT = _ARGS.root
DATA = f"{ROOT}/data/random"
CORPUS = f"{ROOT}/data/corpus.jsonl"
SEQ = 1024
RETR_STEPS = _ARGS.retr_steps
GEN_STEPS = _ARGS.gen_steps
EVAL_EVERY = _ARGS.eval_every
NUM_RETRIEVED = 100


def log(**kw):
    print(json.dumps(kw), flush=True)


def make_data():
    if os.path.exists(CORPUS):
        log(stage="data", note="exists, reusing")
        return
    t0 = time.time()
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "make_synthetic_benchmark.py"),
            "--out", f"{ROOT}/data",
            "--num-files", "3000",
            "--premises-per-file", "43",
            "--num-theorems", "20000",
            "--max-steps", "5",
            "--mathlib-lengths",
            "--min-accessible", "200",
        ],
        check=True,
    )
    log(stage="data", seconds=round(time.time() - t0, 1))


def main():
    make_data()

    from reprover_tpu.models.t5 import T5Config, init_params
    from reprover_tpu.retrieval.datamodule import RetrievalDataModule
    from reprover_tpu.retrieval.prediction import (
        predict,
        save_predictions,
        validation_metrics,
    )
    from reprover_tpu.retrieval.retriever import PremiseRetriever
    from reprover_tpu.training import (
        generation_loss,
        init_train_state,
        make_optimizer,
        make_train_step,
        numeric_batch,
        retrieval_infonce_loss,
        retrieval_loss,
    )

    cfg = T5Config(
        d_model=256, d_kv=32, d_ff=1024, num_heads=8,
        num_encoder_layers=4, num_decoder_layers=4,
        compute_dtype=jnp.bfloat16, remat=False,
    )
    icfg = dataclasses.replace(cfg, flash_encoder=True)

    # ---------------- retriever: train with an R@k curve ----------------
    dm = RetrievalDataModule(
        data_path=DATA, corpus_path=CORPUS,
        num_negatives=3, num_in_file_negatives=1,
        batch_size=8, eval_batch_size=64, max_seq_len=SEQ,
    )
    dm.setup("fit")
    log(stage="retrieval_data", train=len(dm.ds_train), val=len(dm.ds_val),
        premises=len(dm.corpus))

    if _ARGS.init_hf:
        from reprover_tpu.models import load_hf_t5

        params, loaded_cfg = load_hf_t5(_ARGS.init_hf)
        assert (loaded_cfg.d_model, loaded_cfg.num_encoder_layers) == (
            cfg.d_model,
            cfg.num_encoder_layers,
        ), "pretrained geometry must match the fine-tune geometry"
        log(stage="init", source=_ARGS.init_hf)
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)
    retriever = PremiseRetriever(
        params, icfg, max_seq_len=SEQ, num_retrieved=NUM_RETRIEVED
    )
    retriever.load_corpus(dm.corpus)

    def eval_retr(step):
        retriever.mark_stale()
        t0 = time.time()
        m = validation_metrics(
            retriever, dm.val_dataloader(), num_retrieved=NUM_RETRIEVED
        )
        log(stage="retrieval_eval", step=step,
            R1=round(m["Recall@1_val"], 2), R10=round(m["Recall@10_val"], 2),
            R100=round(m["Recall@100_val"], 2), MRR=round(m["MRR"], 4),
            eval_s=round(time.time() - t0, 1))

    eval_retr(0)
    tx = make_optimizer(_ARGS.lr, 200)
    state = init_train_state(params, tx)
    loss_fn = retrieval_loss if _ARGS.loss == "mse" else retrieval_infonce_loss
    step = make_train_step(loss_fn, cfg, tx)
    n = 0
    t0 = time.time()
    done = False
    while not done:
        for batch in dm.train_dataloader():
            state, loss = step(state, numeric_batch(batch))
            n += 1
            if n % 200 == 0:
                log(stage="retrieval_train", step=n, loss=float(loss),
                    sps=round(n / (time.time() - t0), 2))
            if n % EVAL_EVERY == 0:
                retriever.params = state.params
                eval_retr(n)
            if n >= RETR_STEPS:
                done = True
                break

    if _ARGS.retriever_only:
        log(stage="done", note="retriever-only run")
        return

    # ---------------- predictions for the generator ----------------
    retriever.params = state.params
    retriever.mark_stale()
    dm.setup("fit")  # train loader again (flattened per-tactic for predict)
    t0 = time.time()
    pred_dm = RetrievalDataModule(
        data_path=DATA, corpus_path=CORPUS,
        num_negatives=3, num_in_file_negatives=1,
        batch_size=8, eval_batch_size=64, max_seq_len=SEQ,
    )
    pred_dm.corpus = dm.corpus
    pred_dm.setup("predict")
    outputs = predict(retriever, pred_dm.predict_dataloader(), NUM_RETRIEVED)
    preds_path = f"{ROOT}/predictions.pickle"
    save_predictions(outputs, preds_path)
    log(stage="predict", records=len(outputs), seconds=round(time.time() - t0, 1))

    # ---------------- retrieval-augmented generator ----------------
    from reprover_tpu.generation.datamodule import GeneratorDataModule
    from reprover_tpu.generation.generator import TacticGeneratorModel
    from reprover_tpu.generation.validate import validation_metrics as gen_val

    gdm = GeneratorDataModule(
        data_path=DATA, batch_size=8, eval_batch_size=8,
        max_inp_seq_len=SEQ, max_oup_seq_len=64, p_drop=0.5,
        corpus_path=CORPUS, preds_path=preds_path,
    )
    gdm.setup("fit")
    if _ARGS.init_hf:
        from reprover_tpu.models import load_hf_t5

        gparams, _ = load_hf_t5(_ARGS.init_hf)
        log(stage="generator_init", source=_ARGS.init_hf)
    else:
        gparams = init_params(jax.random.PRNGKey(1), cfg)
    gtx = make_optimizer(3e-4, 200)
    gstate = init_train_state(gparams, gtx)
    gstep = make_train_step(generation_loss, cfg, gtx)
    n = 0
    t0 = time.time()
    done = False
    while not done:
        for batch in gdm.train_dataloader():
            gstate, gloss = gstep(gstate, numeric_batch(batch))
            n += 1
            if n % 200 == 0:
                log(stage="generation_train", step=n, loss=float(gloss),
                    sps=round(n / (time.time() - t0), 2))
            if n >= GEN_STEPS:
                done = True
                break

    gen_model = TacticGeneratorModel(
        gstate.params, icfg, max_inp_seq_len=SEQ, max_oup_seq_len=64
    )
    gm = gen_val(gen_model, gdm.val_dataloader(), num_beams=4, limit_batches=8)
    log(stage="generation_eval", **{k: round(v, 4) for k, v in gm.items()})

    # ---------------- prover: Pass@1 on val ----------------
    from reprover_tpu.prover import (
        LocalTacticGenerator,
        RetrievalAugmentedTacticGenerator,
        environment_from_dataset,
        evaluate,
    )

    with open(f"{DATA}/val.json") as f:
        val = json.load(f)
    env = environment_from_dataset(val)
    tac_gen = RetrievalAugmentedTacticGenerator(
        LocalTacticGenerator(gen_model), retriever,
        max_inp_seq_len=SEQ, max_num_retrieved=NUM_RETRIEVED,
    )
    t0 = time.time()
    pass_1 = evaluate(
        DATA, env, tac_gen,
        split="val", num_theorems=200, num_sampled_tactics=8,
        timeout=120, max_expansions=10, num_workers=1,
    )
    log(stage="prover", pass_1=round(pass_1, 4),
        minutes=round((time.time() - t0) / 60, 1))


if __name__ == "__main__":
    main()
