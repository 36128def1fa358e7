"""InferenceService under concurrent search load (the vLLM role benchmark).

N prover worker processes hammer one shared TPU service with 64-beam
generate requests through the replay environment (instant "Lean", so the
measurement isolates serving throughput — real searches add idle gaps the
batching is designed to absorb,
`/root/reference/prover/proof_search.py:332-366`).

Geometry matches the round-1 expansion benchmark: random-weight byt5-small,
input 512, output 128, 64 beams. Prints one JSON line per cell:
expansions/s, searched nodes, and the service's batching stats.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/service_load"
DATA = f"{ROOT}/data/random"


# ------------------------------------------------------------------ #
# Always-progress environment: every tactic yields a fresh open state, so
# each search performs exactly max_expansions service requests. A replay
# environment dies after 1 expansion under a random-weight model (no
# generated tactic matches ground truth), which would measure process
# startup, not serving throughput.
# ------------------------------------------------------------------ #
from reprover_tpu.prover.environment import (  # noqa: E402
    Environment,
    Session,
    TacticState,
)


class _LoadSession(Session):
    def __init__(self, latency_s: float = 0.0):
        self.latency_s = latency_s

    def run_tac(self, state, tactic):
        if self.latency_s > 0.0:
            # Scripted Lean-bound wait (VERDICT round-4 weak #6: realistic
            # multi-second run_tac latencies, not instant replay). ±50%
            # deterministic jitter so waves don't stay phase-locked.
            h = hash((state.pp, tactic)) & 0xFFFF
            time.sleep(self.latency_s * (0.5 + h / 0xFFFF))
        # Unique successor per (state, tactic): no dedup, tree keeps growing.
        return TacticState(
            f"{state.pp[:128]}|{hash((state.pp, tactic)) & 0xFFFF:x}"
        )


class _LoadEnter:
    def __init__(self, theorem, latency_s: float = 0.0):
        self.theorem = theorem
        self.latency_s = latency_s

    def __enter__(self):
        return (
            _LoadSession(self.latency_s),
            TacticState(f"⊢ load {self.theorem.full_name}"),
        )

    def __exit__(self, *exc):
        return None


class LoadEnvironment(Environment):
    """Picklable; accepts any theorem. ``latency_s`` injects a scripted
    per-tactic Lean wait (the continuous-batching design target: the TPU
    stays busy on other searches during env-bound gaps)."""

    def __init__(self, latency_s: float = 0.0):
        self.latency_s = latency_s

    def enter(self, theorem):
        return _LoadEnter(theorem, self.latency_s)


def log(**kw):
    print(json.dumps(kw), flush=True)


def make_data():
    if os.path.exists(f"{ROOT}/data/corpus.jsonl"):
        return
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "make_synthetic_benchmark.py"),
            "--out", f"{ROOT}/data",
            "--num-files", "40", "--premises-per-file", "10",
            "--num-theorems", "400", "--max-steps", "3",
        ],
        check=True,
    )


def run_cell(
    model, val, num_workers, max_batch, window_ms, num_theorems=24,
    streaming=False, num_slots=8, chunk_size=8, step_buckets=None,
    mesh=None, quantize=False, num_beams=64, env_latency_s=0.0,
    max_expansions=6,
):
    from reprover_tpu.prover import (
        FixedTacticGenerator,
        InferenceService,
        StreamingInferenceService,
    )
    from reprover_tpu.prover.distributed import DistributedProver
    from reprover_tpu.prover.evaluate import get_theorems

    if streaming:
        service = StreamingInferenceService(
            model, num_slots=num_slots, num_beams=num_beams,
            chunk_size=chunk_size,
            step_buckets=step_buckets, mesh=mesh, quantize=quantize,
        )
    else:
        service = InferenceService(
            model, max_batch=max_batch, batch_window_s=window_ms / 1000.0
        )
    service.start()
    try:
        env = LoadEnvironment(latency_s=env_latency_s)
        theorems, positions = get_theorems(DATA, split="val")
        theorems, positions = theorems[:num_theorems], positions[:num_theorems]
        prover = DistributedProver(
            FixedTacticGenerator("unused"),
            env,
            num_workers,
            timeout=600,
            max_expansions=max_expansions,
            num_sampled_tactics=num_beams,
            make_client=service.client,
        )
        t0 = time.time()
        results = prover.search_unordered(theorems, positions)
        wall = time.time() - t0
    finally:
        service.stop()
    done = [r for r in results if r is not None]
    expansions = sum(r.num_searched_nodes for r in done)
    stats = service.stats_snapshot()
    # Serving window = first request seen -> last response sent. The raw
    # wall includes spawning the worker processes (heavy imports), which
    # is startup, not serving.
    window = stats.pop("last_resp_ts", wall) - stats.pop("first_req_ts", 0.0)
    log(
        mode="streaming" if streaming else "coalescing",
        beams=num_beams,
        env_latency_s=env_latency_s,
        tp=mesh.devices.size if mesh is not None else 0,
        quantize=quantize,
        buckets=step_buckets if streaming else None,
        slots=num_slots if streaming else None,
        chunk=chunk_size if streaming else None,
        workers=num_workers,
        max_batch=max_batch,
        window_ms=window_ms,
        theorems=len(done),
        expansions=expansions,
        wall_s=round(wall, 1),
        expansions_per_s=round(expansions / wall, 2),
        serve_window_s=round(window, 1),
        expansions_per_s_serving=round(expansions / max(window, 1e-9), 2),
        stats={k: round(v, 3) if isinstance(v, float) else v
               for k, v in stats.items()},
    )


class _ByteTokenizer:
    """HF-tokenizer-shaped byte mapper for the random-weight causal cell."""

    def __init__(self, vocab: int) -> None:
        self.vocab = vocab

    def __call__(self, text, add_special_tokens=True):
        return {"input_ids": [3 + (b % (self.vocab - 3)) for b in text.encode()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


def make_model(causal: bool, llama7b: bool = False):
    import jax
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform == "tpu"
    if llama7b:
        # Real LLaMA-7B geometry (random weights): the serving tier the
        # int8/int4 rows in BASELINE.md AOT-gate — this drives it through
        # the FULL streaming service under concurrent search load
        # (VERDICT round-4 ask #3). Requires --bits 8/4 on a 16 GB chip.
        from reprover_tpu.generation.causal_generator import (
            CausalTacticGeneratorModel,
        )
        from reprover_tpu.models.causal_lm import CausalLMConfig, init_params

        cfg = CausalLMConfig(
            vocab_size=32000, d_model=4096, num_layers=32, num_heads=32,
            num_kv_heads=32, d_ff=11008,
            compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        return CausalTacticGeneratorModel(
            params, cfg, _ByteTokenizer(cfg.vocab_size),
            max_inp_seq_len=512, max_oup_seq_len=128,
            template="[GOAL]\n%s\n[PROOFSTEP]\n",
        )
    if causal:
        from reprover_tpu.generation.causal_generator import (
            CausalTacticGeneratorModel,
        )
        from reprover_tpu.models.causal_lm import CausalLMConfig, init_params

        # Decoder-only at a byt5-small-comparable decode cost: the engine
        # serves the LLaMA family; vocab kept small so compiles stay sane.
        cfg = CausalLMConfig(
            vocab_size=4096, d_model=1024, num_layers=8, num_heads=16,
            num_kv_heads=8, d_ff=2816,
            compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        return CausalTacticGeneratorModel(
            params, cfg, _ByteTokenizer(cfg.vocab_size),
            max_inp_seq_len=512, max_oup_seq_len=128, template="[GOAL]\n%s\n[PROOFSTEP]\n",
        )
    from reprover_tpu.generation.generator import TacticGeneratorModel
    from reprover_tpu.models.t5 import byt5_small, fuse_mlp_params, init_params

    cfg = byt5_small(
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        flash_encoder=on_tpu,
        unroll_encoder=on_tpu,
    )
    params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
    return TacticGeneratorModel(
        params, cfg, max_inp_seq_len=512, max_oup_seq_len=128
    )


def _flag_value(name, default=None, cast=str):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    make_data()
    causal = "--causal" in sys.argv
    llama7b = "--llama7b" in sys.argv
    model = make_model(causal, llama7b)
    with open(f"{DATA}/val.json") as f:
        val = json.load(f)

    env_latency_s = _flag_value("--env-latency", 0.0, float)
    bits = _flag_value("--bits", None, int)
    quantize = {None: "--quantize" in sys.argv, 8: "int8", 4: "int4"}[bits]

    if llama7b:
        # One steady-state cell, run twice (pass 1 pays the compiles):
        # 4 slots x 8 beams (the BASELINE serve geometry), 16 workers so
        # admission waves and the coalescer actually meet the prefill.
        for _ in range(2):
            run_cell(
                model, val, 16, 0, 0.0, streaming=True,
                num_slots=4, chunk_size=8, num_beams=8,
                step_buckets=(32, 64, 96, 129),
                quantize=quantize, env_latency_s=env_latency_s,
                num_theorems=_flag_value("--num-theorems", 24, int),
            )
        return

    quick = "--quick" in sys.argv
    streaming_only = "--streaming-only" in sys.argv
    coalescing_cells = (
        # Two passes: pass 1 pays the jit compiles (minutes through the
        # tunnel), pass 2 is the steady-state number to report.
        ((8, 16, 15.0), (16, 16, 15.0)) * 2
        if quick
        else ((1, 8, 5.0), (4, 8, 5.0), (8, 8, 5.0), (8, 16, 15.0), (16, 16, 15.0))
    )
    streaming_cells = (
        ((16, 8, 8),) * 2  # 8 slots measured best (16 doubles step cost)
        if quick
        else ((4, 4, 8), (8, 8, 8), (16, 8, 8), (16, 16, 8), (16, 8, 16))
    )
    if streaming_only:
        coalescing_cells = ()
    for num_workers, max_batch, window_ms in coalescing_cells:
        run_cell(model, val, num_workers, max_batch, window_ms)
    # Length-bucketed stepping: decode-depth buckets for the per-beam KV
    # caches (dec len is 128, +1 start for causal); quarters of the range.
    T = 129 if causal else 128
    buckets = tuple(sorted({32, 64, 96, T}))
    # --tp1: a 1-device mesh through the full TP code path (sharded params,
    # explicit out_shardings) — measures the TP machinery's single-chip
    # overhead vs the meshless engine (VERDICT #1: should be ~0).
    mesh = None
    if "--tp1" in sys.argv:
        import jax
        from reprover_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, model=1)
    for num_workers, num_slots, chunk in streaming_cells:
        run_cell(
            model, val, num_workers, 0, 0.0, streaming=True,
            num_slots=num_slots, chunk_size=chunk,
            step_buckets=buckets if "--buckets" in sys.argv else None,
            mesh=mesh,
            # --quantize / --bits: weight-only int8/int4 engine weights
            # (near-lossless; a weight-memory option at byt5 scale, a
            # bandwidth win for weight-bound models).
            quantize=quantize,
            env_latency_s=env_latency_s,
        )


if __name__ == "__main__":
    main()
