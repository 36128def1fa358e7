"""Does a pretrained init move the retrieval quality ceiling? (VERDICT r2 #3)

BASELINE.md's 40k-step run showed the reference MSE recipe from RANDOM init
plateaus at R@10 ~ 1.4-1.8 on the reference-scale synthetic benchmark — and
the reference never trains from random init: it fine-tunes pretrained byt5
(`/root/reference/retrieval/model.py:45`). This driver supplies the missing
stage offline and measures the delta, at the same geometry / data / recipe
as the recorded plateau (d_model 256, 4+4 layers,
benchmarks/synthetic_reference_scale.py):

1. span-corruption pretraining (`reprover_tpu.training.pretrain`) over the
   129k-premise corpus text;
2. HF-layout export;
3. the SAME reference-recipe MSE fine-tune, initialized from the export
   (`--init-hf`), logging the R@k/MRR curve.

Run (one v5e):  PYTHONPATH=. python benchmarks/pretrain_then_finetune.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

ap = argparse.ArgumentParser()
ap.add_argument("--root", default="/tmp/synth_ref_scale")
ap.add_argument("--pretrain-steps", type=int, default=20000)
ap.add_argument("--finetune-steps", type=int, default=12000)
ap.add_argument("--eval-every", type=int, default=1000)
ap.add_argument("--batch-size", type=int, default=32)
ap.add_argument("--lr", type=float, default=1e-3)
ap.add_argument("--skip-pretrain", action="store_true",
                help="reuse an existing export")
args = ap.parse_args()

CORPUS = f"{args.root}/data/corpus.jsonl"
EXPORT = f"{args.root}/pretrained_d256"
LOGS = f"{args.root}/pretrain_logs"


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    subprocess.run(cmd, check=True, env=env)
    print(json.dumps({"cmd": cmd[2] if len(cmd) > 2 else cmd[0],
                      "minutes": round((time.time() - t0) / 60, 1)}),
          flush=True)


def main():
    assert os.path.exists(CORPUS), (
        f"{CORPUS} missing - run benchmarks/synthetic_reference_scale.py "
        "once (it generates the data) or scripts/make_synthetic_benchmark.py"
    )
    if not args.skip_pretrain:
        run([
            sys.executable, "-m", "reprover_tpu.training.pretrain", "fit",
            "--data.data_path", CORPUS,
            "--data.batch_size", str(args.batch_size),
            "--data.max_inp_seq_len", "1024",
            "--data.max_oup_seq_len", "256",
            "--model.lr", str(args.lr),
            "--model.warmup_steps", "1000",
            # The from-scratch-learnable reference-scale geometry — must
            # match the fine-tune's (synthetic_reference_scale.py).
            "--model.d_model", "256",
            "--model.d_kv", "32",
            "--model.d_ff", "1024",
            "--model.num_heads", "8",
            "--model.num_encoder_layers", "4",
            "--model.num_decoder_layers", "4",
            "--model.remat", "false",
            "--trainer.max_steps", str(args.pretrain_steps),
            "--trainer.val_interval", "2000",
            "--trainer.log_interval", "200",
            "--trainer.patience", "1000000",  # fixed-budget run
            "--export_dir", EXPORT,
            "--log_dir", LOGS,
        ])
    run([
        sys.executable, os.path.join(HERE, "synthetic_reference_scale.py"),
        "--retriever-only",
        "--root", args.root,
        "--retr-steps", str(args.finetune_steps),
        "--eval-every", str(args.eval_every),
        "--loss", "mse",
        "--init-hf", EXPORT,
    ])


if __name__ == "__main__":
    main()
