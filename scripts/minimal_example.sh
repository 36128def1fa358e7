#!/usr/bin/env bash
# Minimal smoke run (role of /root/reference/scripts/minimal_example.sh:13):
# prove one theorem with the fixed-tactic generator in 60 seconds.
# Requires the LeanDojo benchmark at data/leandojo_benchmark_4 and lean_dojo
# installed (the Lean-interaction dependency).
set -euo pipefail

python -m reprover_tpu.prover.evaluate \
    --data-path data/leandojo_benchmark_4/random \
    --split val \
    --tactic aesop \
    --num-theorems 1 \
    --timeout 60 \
    --num-workers 1
