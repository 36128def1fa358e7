"""T5 span-corruption pretraining (the ByT5 objective), from corpus text.

The reference never trains from scratch: both tasks fine-tune pretrained
``google/byt5-small`` (`/root/reference/retrieval/model.py:45`,
`/root/reference/generation/model.py:87`). Offline, that init is
unavailable, and BASELINE.md's 40k-step run shows the retrieval recipe
plateaus at R@10 ~ 1.4-1.8 from random init — the ceiling is the missing
pretraining, not the fine-tune recipe. This module supplies the missing
stage: the span-corruption denoising objective ByT5 was pretrained with
(Raffel et al. T5 §3.1.4; ByT5 uses mean span 20 *bytes*, density 15%),
run over the premise corpus text, producing a checkpoint the existing
fine-tune CLIs load via their HF-directory escape hatch
(``--model.model_name <exported dir>``).

TPU notes: examples are packed to fixed (inputs, targets) shapes computed
from the corruption rates, so XLA compiles exactly one train-step shape;
batches are bf16 + remat like the fine-tune stages.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import sys
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from reprover_tpu.tokenizer import BYTE_OFFSET, EOS_ID, VOCAB_SIZE
from reprover_tpu.training.loop import TrainerConfig

logger = logging.getLogger(__name__)

# First sentinel id: <extra_id_0> is the LAST vocab id (HF ByT5 convention),
# successive sentinels descend.
SENTINEL_START = VOCAB_SIZE - 1


# ------------------------------------------------------------------ #
# Span corruption
# ------------------------------------------------------------------ #


def _random_segmentation(
    num_items: int, num_segments: int, rng: np.random.Generator
) -> np.ndarray:
    """Partition ``num_items`` into ``num_segments`` positive integers,
    uniformly over compositions (T5's ``_random_segmentation`` semantics)."""
    assert 1 <= num_segments <= num_items
    # Choose segment boundaries among the num_items-1 gaps.
    cuts = rng.choice(num_items - 1, size=num_segments - 1, replace=False) + 1
    cuts = np.sort(cuts)
    return np.diff(np.concatenate([[0], cuts, [num_items]])).astype(np.int64)


def span_corrupt(
    tokens: np.ndarray,
    rng: np.random.Generator,
    noise_density: float = 0.15,
    mean_span_length: float = 20.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Corrupt a 1-D token window into (inputs, targets).

    Noise tokens are grouped into spans; each span is replaced in the
    inputs by one sentinel, and the targets are the sentinel-delimited
    spans followed by EOS — the seq2seq denoising objective T5/ByT5
    pretrains with. Lengths follow from the rates: for a window of W
    tokens, inputs ~ W*(1-density)+spans+1 and targets ~
    W*density+spans+1.
    """
    L = len(tokens)
    num_noise = int(np.round(L * noise_density))
    num_noise = min(max(num_noise, 1), L - 1)
    num_spans = int(np.round(num_noise / mean_span_length))
    num_spans = min(max(num_spans, 1), num_noise, L - num_noise)

    noise_lens = _random_segmentation(num_noise, num_spans, rng)
    keep_lens = _random_segmentation(L - num_noise, num_spans, rng)

    inputs: List[int] = []
    targets: List[int] = []
    pos = 0
    for k in range(num_spans):
        keep, noise = int(keep_lens[k]), int(noise_lens[k])
        sentinel = SENTINEL_START - k
        inputs.extend(tokens[pos : pos + keep])
        inputs.append(sentinel)
        targets.append(sentinel)
        targets.extend(tokens[pos + keep : pos + keep + noise])
        pos += keep + noise
    inputs.append(EOS_ID)
    targets.append(EOS_ID)
    return np.asarray(inputs, np.int32), np.asarray(targets, np.int32)


def window_length_for(
    max_inp: int, max_tgt: int, noise_density: float, mean_span_length: float
) -> int:
    """Largest window W whose corrupted (inputs, targets) always fit
    (max_inp, max_tgt) — the T5 ``random_spans_helper`` role."""

    def lens(W: int) -> Tuple[int, int]:
        num_noise = min(max(int(np.round(W * noise_density)), 1), W - 1)
        num_spans = min(
            max(int(np.round(num_noise / mean_span_length)), 1),
            num_noise,
            W - num_noise,
        )
        return W - num_noise + num_spans + 1, num_noise + num_spans + 1

    W = 2
    while True:
        inp, tgt = lens(W + 1)
        if inp > max_inp or tgt > max_tgt:
            return W
        W += 1


# ------------------------------------------------------------------ #
# Data pipeline
# ------------------------------------------------------------------ #


def corpus_text(data_path: str) -> str:
    """All premise serializations from a LeanDojo-format ``corpus.jsonl``
    (the text the retriever/generator will later embed/read), newline-joined
    in file order."""
    chunks: List[str] = []
    with open(data_path) as f:
        for line in f:
            rec = json.loads(line)
            for prem in rec["premises"]:
                chunks.append(prem["code"])
    return "\n\n".join(chunks)


class PretrainDataModule:
    """Fixed-shape span-corruption batches from one big byte stream.

    The whole corpus is tokenized once into a flat id array; each example
    is a random window, corrupted host-side (cheap byte ops), padded to the
    static (max_inp, max_tgt) shapes. A held-out tail of the stream feeds
    validation so the monitored loss is on unseen text.
    """

    def __init__(
        self,
        data_path: str,
        batch_size: int = 8,
        max_inp_seq_len: int = 1024,
        max_oup_seq_len: int = 256,
        noise_density: float = 0.15,
        mean_span_length: float = 20.0,
        val_fraction: float = 0.01,
        steps_per_epoch: int = 1000,
        seed: int = 0,
    ) -> None:
        self.batch_size = batch_size
        self.max_inp = max_inp_seq_len
        self.max_tgt = max_oup_seq_len
        self.noise_density = noise_density
        self.mean_span_length = mean_span_length
        self.steps_per_epoch = steps_per_epoch
        self.seed = seed

        text = corpus_text(data_path)
        ids = np.frombuffer(text.encode("utf-8"), np.uint8).astype(np.int32)
        ids += BYTE_OFFSET
        split = int(len(ids) * (1.0 - val_fraction))
        self.train_ids = ids[:split]
        self.val_ids = ids[split:]
        self.window = window_length_for(
            self.max_inp, self.max_tgt, noise_density, mean_span_length
        )
        logger.info(
            "pretrain stream: %.1f MB train, %.1f MB val, window %d bytes",
            len(self.train_ids) / 1e6,
            len(self.val_ids) / 1e6,
            self.window,
        )

    def _batch(
        self, ids: np.ndarray, rng: np.random.Generator
    ) -> Dict[str, np.ndarray]:
        B = self.batch_size
        inp = np.zeros((B, self.max_inp), np.int32)
        mask = np.zeros((B, self.max_inp), np.int32)
        tgt = np.full((B, self.max_tgt), -100, np.int32)  # -100 = CE-masked
        starts = rng.integers(0, len(ids) - self.window, B)
        for i, s in enumerate(starts):
            x, y = span_corrupt(
                ids[s : s + self.window],
                rng,
                self.noise_density,
                self.mean_span_length,
            )
            inp[i, : len(x)] = x
            mask[i, : len(x)] = 1
            tgt[i, : len(y)] = y
        return {"state_ids": inp, "state_mask": mask, "tactic_ids": tgt}

    def train_dataloader(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        while True:  # infinite stream; Trainer stops at max_steps
            yield self._batch(self.train_ids, rng)

    def val_batches(self, num_batches: int = 8) -> List[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + 1)  # fixed val sample
        return [self._batch(self.val_ids, rng) for _ in range(num_batches)]


# ------------------------------------------------------------------ #
# CLI
# ------------------------------------------------------------------ #


@dataclasses.dataclass
class PretrainModelConfig:
    lr: float = 1e-3
    warmup_steps: int = 1000
    tiny: bool = False
    remat: bool = True
    offload_optimizer: bool = False
    # Bug-isolation A/B (--model.flash false): pretrain with naive attention
    # even where the Pallas fwd+bwd kernels are eligible (d_kv >= 64 on TPU).
    flash: bool = True
    # Custom geometry (None -> google/byt5-small value). The reference-scale
    # quality runs use d_model 256 / 4+4 layers (the from-scratch-learnable
    # size, benchmarks/synthetic_reference_scale.py) — pretraining must match
    # the geometry the fine-tune will load.
    d_model: Optional[int] = None
    d_kv: Optional[int] = None
    d_ff: Optional[int] = None
    num_heads: Optional[int] = None
    num_encoder_layers: Optional[int] = None
    num_decoder_layers: Optional[int] = None


@dataclasses.dataclass
class PretrainDataConfig:
    data_path: str = ""  # corpus.jsonl
    batch_size: int = 8
    max_inp_seq_len: int = 1024
    max_oup_seq_len: int = 256
    noise_density: float = 0.15
    mean_span_length: float = 20.0


@dataclasses.dataclass
class PretrainConfig:
    model: PretrainModelConfig = dataclasses.field(
        default_factory=PretrainModelConfig
    )
    data: PretrainDataConfig = dataclasses.field(
        default_factory=PretrainDataConfig
    )
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: _default_trainer()
    )
    seed: int = 3407
    log_dir: Optional[str] = None
    export_dir: Optional[str] = None  # HF-layout dir for the fine-tune CLIs
    data_parallel: bool = True


def _default_trainer() -> TrainerConfig:
    return TrainerConfig(
        max_steps=100_000,
        val_interval=2_000,
        monitor="loss_val",
        monitor_mode="min",
        patience=10,
        # Pretraining is where the warmup-peak blow-up happened (round 4:
        # lr 1e-3 at 300M — see training/health.py); guard on by default.
        divergence_factor=1.5,
    )


def run_fit(cfg: PretrainConfig) -> None:
    import jax
    import jax.numpy as jnp

    from reprover_tpu.models import init_params
    from reprover_tpu.models.t5 import T5Config, byt5_small
    from reprover_tpu.parallel import make_mesh
    from reprover_tpu.training import (
        generation_loss,
        init_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from reprover_tpu.training.loop import Trainer
    from reprover_tpu.utils import make_writer
    from reprover_tpu.utils.config import config_to_dict

    dm = PretrainDataModule(
        data_path=cfg.data.data_path,
        batch_size=cfg.data.batch_size,
        max_inp_seq_len=cfg.data.max_inp_seq_len,
        max_oup_seq_len=cfg.data.max_oup_seq_len,
        noise_density=cfg.data.noise_density,
        mean_span_length=cfg.data.mean_span_length,
        seed=cfg.seed,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if cfg.model.tiny:
        model_cfg = T5Config(
            d_model=32,
            d_kv=8,
            d_ff=64,
            num_heads=4,
            num_encoder_layers=2,
            num_decoder_layers=1,
            compute_dtype=dtype,
        )
    else:
        model_cfg = byt5_small(compute_dtype=dtype)
        overrides = {
            k: v
            for k in (
                "d_model",
                "d_kv",
                "d_ff",
                "num_heads",
                "num_encoder_layers",
                "num_decoder_layers",
            )
            if (v := getattr(cfg.model, k)) is not None
        }
        if overrides:
            model_cfg = dataclasses.replace(model_cfg, **overrides)
    if cfg.model.remat:
        model_cfg = dataclasses.replace(model_cfg, remat=True)
    if (
        on_tpu
        and cfg.model.flash
        and model_cfg.d_kv >= 64
        and not (cfg.data_parallel and len(jax.devices()) > 1)
    ):
        # max_inp/max_oup default to 1024/256, both 128-aligned -> flash
        # kernels (fwd+bwd) are eligible exactly as in the fine-tune stage.
        # (Small-geometry overrides keep the naive path: the Pallas tiles
        # assume byt5-class head dims.) Single-device only: a pallas_call
        # is not SPMD-partitionable under a mesh.
        model_cfg = dataclasses.replace(
            model_cfg, flash_encoder=True, flash_decoder=True
        )
    params = init_params(jax.random.PRNGKey(cfg.seed), model_cfg)

    mesh = None
    if cfg.data_parallel and len(jax.devices()) > 1:
        import math

        data = math.gcd(cfg.data.batch_size, len(jax.devices()))
        mesh = make_mesh(data=data) if data > 1 else None

    tx = make_optimizer(cfg.model.lr, cfg.model.warmup_steps)
    state = init_train_state(params, tx)
    if cfg.model.offload_optimizer:
        from reprover_tpu.training import offload_opt_state

        state = offload_opt_state(state, mesh)
    step_fn = make_train_step(
        generation_loss,
        model_cfg,
        tx,
        mesh=mesh,
        offload_opt=cfg.model.offload_optimizer,
    )
    eval_step = make_eval_step(generation_loss, model_cfg, mesh=mesh)
    writer = make_writer(cfg.log_dir, stdout_every=cfg.trainer.log_interval)
    writer.write_hparams(config_to_dict(cfg))
    val_batches = dm.val_batches()

    # Representation-health probe (training/health.py): pooled-embedding
    # effective rank of one fixed val batch, logged every validation — a
    # healthy encoder probes >> 1, the round-4 collapsed lineage ~1.2.
    from reprover_tpu.models.t5 import encode as _encode
    from reprover_tpu.ops.pooling import masked_mean_normalize
    from reprover_tpu.training.health import (
        embedding_anisotropy,
        embedding_eff_rank,
    )
    from reprover_tpu.training.tasks import numeric_batch

    @jax.jit
    def _probe_embed(params, ids, mask):
        return masked_mean_normalize(_encode(params, model_cfg, ids, mask), mask)

    probe_batch = numeric_batch(val_batches[0]) if val_batches else None

    def validate(train_state, step):
        losses = [
            float(eval_step(train_state.params, numeric_batch(b)))
            for b in val_batches
        ]
        metrics = {"loss_val": float(np.mean(losses))}
        if probe_batch is not None:
            emb = np.asarray(
                _probe_embed(
                    train_state.params,
                    probe_batch["state_ids"],
                    probe_batch["state_mask"],
                )
            )
            metrics["emb_eff_rank"] = embedding_eff_rank(emb)
            # round-5 lesson: anisotropy (cos spread), not pretrain loss,
            # predicts whether the init can feed the MSE fine-tune —
            # watch cos_offdiag_std: healthy inits ~0.03, doomed <0.001.
            metrics.update(embedding_anisotropy(emb))
        return metrics

    trainer = Trainer(cfg.trainer, step_fn, writer, validate_fn=validate)
    state = trainer.fit(state, dm.train_dataloader())
    writer.close()

    if cfg.export_dir:
        export(state.params, model_cfg, cfg.export_dir)


def export(params: Dict, model_cfg: Any, out_dir: str) -> None:
    """HF-layout export so the fine-tune CLIs consume the pretrained init
    via ``--model.model_name <out_dir>`` (their local-directory path)."""
    import jax
    import jax.numpy as jnp

    from reprover_tpu.models.hf_import import export_hf_t5

    f32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    export_hf_t5(f32, model_cfg, out_dir)
    logger.info("exported pretrained checkpoint to %s", out_dir)


def main(argv: Optional[List[str]] = None) -> None:
    from reprover_tpu.utils.config import parse_config

    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)
    subcommand, cfg = parse_config(
        PretrainConfig, argv if argv is not None else sys.argv[1:]
    )
    np.random.seed(cfg.seed)
    if subcommand == "fit":
        run_fit(cfg)
    else:
        raise SystemExit(f"unknown subcommand {subcommand!r} (fit)")


if __name__ == "__main__":
    main()
