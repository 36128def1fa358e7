"""Tactic generator model: ByT5 seq2seq with batched beam-search generation.

Capability parity with the reference generator stack
(`/root/reference/generation/model.py:49-210`,
`/root/reference/prover/tactic_generator.py:169-243`): teacher-forced CE
training and beam-search generation returning (text, score) candidates.

TPU design: the whole generate path — encoder forward, KV-cache allocation,
and the full beam-search while-loop — is one jit'd program per
(batch, beams, src-bucket, out-len) shape, so a serving engine can hammer it
with continuously re-batched requests at zero Python overhead per token.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reprover_tpu.generation.beam_search import BeamSearchResult, beam_search
from reprover_tpu.models import (
    decode_step,
    encode as t5_encode,
    init_decode_state,
    load_hf_t5,
)
from reprover_tpu.models.t5 import DecodeState, Params, T5Config, forward_loss
from reprover_tpu.tokenizer import ByT5Tokenizer


def _tile_beams(x: jnp.ndarray, num_beams: int) -> jnp.ndarray:
    """[B, ...] -> [B*num_beams, ...] with each row repeated contiguously."""
    return jnp.repeat(x, num_beams, axis=0)


class TacticGeneratorModel:
    """Seq2seq model wrapper: loss for training, beam search for serving."""

    def __init__(
        self,
        params: Params,
        cfg: T5Config,
        max_inp_seq_len: int,
        max_oup_seq_len: int,
        length_penalty: float = 0.0,
        bucket_multiple: int = 256,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.max_inp_seq_len = max_inp_seq_len
        self.max_oup_seq_len = max_oup_seq_len
        self.length_penalty = length_penalty
        self.bucket_multiple = bucket_multiple
        self.tokenizer = ByT5Tokenizer()

        @partial(jax.jit, static_argnames=("num_beams", "max_length"))
        def _generate_jit(params, input_ids, attention_mask, num_beams, max_length):
            cfg_ = self.cfg
            b = input_ids.shape[0]
            enc = t5_encode(params, cfg_, input_ids, attention_mask)
            enc = _tile_beams(enc, num_beams)
            mask = _tile_beams(attention_mask, num_beams)
            cache = init_decode_state(params, cfg_, enc, mask, max_length)

            def step_fn(cache: DecodeState, tokens):
                return decode_step(params, cfg_, cache, tokens)

            def reorder_fn(cache: DecodeState, flat_parent):
                return DecodeState(
                    self_k=jnp.take(cache.self_k, flat_parent, axis=1),
                    self_v=jnp.take(cache.self_v, flat_parent, axis=1),
                    cross_k=cache.cross_k,
                    cross_v=cache.cross_v,
                    encoder_hidden=cache.encoder_hidden,
                    cross_bias=cache.cross_bias,
                    step=cache.step,
                )

            return beam_search(
                step_fn,
                reorder_fn,
                cache,
                batch_size=b,
                num_beams=num_beams,
                max_length=max_length,
                eos_id=cfg_.eos_token_id,
                pad_id=cfg_.pad_token_id,
                start_id=cfg_.decoder_start_token_id,
                length_penalty=self.length_penalty,
            )

        self._generate_jit = _generate_jit

    @classmethod
    def load_hf(
        cls,
        ckpt_dir: str,
        max_inp_seq_len: int,
        max_oup_seq_len: int,
        length_penalty: float = 0.0,
        compute_dtype: Any = None,
        quantize: "bool | str" = False,
    ) -> "TacticGeneratorModel":
        on_tpu = jax.devices()[0].platform == "tpu"
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
        params, cfg = load_hf_t5(
            ckpt_dir,
            compute_dtype=compute_dtype,
            # Serving entry point — fused Pallas encoder attention + unrolled
            # encoder stack on TPU.
            flash_encoder=on_tpu,
            unroll_encoder=on_tpu,
        )
        if on_tpu:
            from reprover_tpu.models.t5 import fuse_mlp_params

            params = fuse_mlp_params(params)
        if quantize:
            # Weight-only int8: halves the HBM weight traffic that bounds
            # per-token decode (near-lossless per-channel quantization).
            # "int4" quarters it (packed nibbles, per-group scales).
            from reprover_tpu.models.quantize import (
                quantize_t5_params,
                resolve_quantize_bits,
            )

            params = quantize_t5_params(
                params, bits=resolve_quantize_bits(quantize)
            )
        return cls(params, cfg, max_inp_seq_len, max_oup_seq_len, length_penalty)

    # -------------------------------------------------------------- #
    # Generation
    # -------------------------------------------------------------- #

    def generate(
        self,
        states: Sequence[str],
        num_samples: int,
        max_length: Optional[int] = None,
    ) -> List[List[Tuple[str, float]]]:
        """Beam-search ``num_samples`` candidates per input state.

        Returns per-state lists of (decoded text, sequence score) in
        descending score order — the raw HF-`generate` equivalent; tactic
        de-duplication happens in the prover layer
        (`prover/tactic_generator.py:235-241`).
        """
        max_length = max_length or self.max_oup_seq_len
        batch = self.tokenizer(
            states,
            max_length=self.max_inp_seq_len,
            bucket_multiple=self.bucket_multiple,
        )
        result: BeamSearchResult = self._generate_jit(
            self.params,
            jnp.asarray(batch.input_ids),
            jnp.asarray(batch.attention_mask),
            num_beams=num_samples,
            max_length=max_length,
        )
        sequences = np.asarray(result.sequences)
        scores = np.asarray(result.scores)
        out: List[List[Tuple[str, float]]] = []
        for b in range(len(states)):
            row = []
            for k in range(num_samples):
                text = self.tokenizer.decode(sequences[b, k], skip_special_tokens=True)
                row.append((text, float(scores[b, k])))
            out.append(row)
        return out

    # -------------------------------------------------------------- #
    # Streaming-engine integration (model-agnostic serving loop)
    # -------------------------------------------------------------- #

    def make_stepwise_engine(
        self, num_slots: int, num_beams: int, chunk_size: int = 8,
        mesh: Any = None, step_buckets: Any = None,
        quantize: "bool | str" = False, reorder_mode: str = "auto",
    ) -> Any:
        """Build the continuous-batching engine for this model family.

        ``mesh`` enables tensor-parallel serving over its ``model`` axis
        (the vLLM ``tensor_parallel_size`` role,
        `/root/reference/prover/proof_search.py:345`). ``step_buckets``
        enables length-bucketed stepping (see ``StepwiseEngineBase``)."""
        from reprover_tpu.generation.engine import StepwiseBeamEngine
        from reprover_tpu.tokenizer import round_to_bucket

        return StepwiseBeamEngine(
            self.params,
            self.cfg,
            num_slots=num_slots,
            num_beams=num_beams,
            max_src_len=round_to_bucket(
                self.max_inp_seq_len, self.bucket_multiple
            ),
            max_decode_len=self.max_oup_seq_len,
            length_penalty=self.length_penalty,
            chunk_size=chunk_size,
            mesh=mesh,
            step_buckets=step_buckets,
            quantize=quantize,
            reorder_mode=reorder_mode,
        )

    def tokenize_for_engine(
        self, states: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenize an admission wave padded to the engine's source bucket."""
        from reprover_tpu.tokenizer import round_to_bucket

        batch = self.tokenizer(
            states,
            max_length=self.max_inp_seq_len,
            pad_to=round_to_bucket(self.max_inp_seq_len, self.bucket_multiple),
        )
        return batch.input_ids, batch.attention_mask

    def decode_candidates(
        self, seqs: np.ndarray, scores: np.ndarray, lens: np.ndarray
    ) -> List[Tuple[str, float]]:
        """Finalized engine beams -> (text, score), matching ``generate``."""
        return [
            (
                self.tokenizer.decode(seqs[k], skip_special_tokens=True),
                float(scores[k]),
            )
            for k in range(len(scores))
        ]

    # -------------------------------------------------------------- #
    # Training
    # -------------------------------------------------------------- #

    def loss(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        labels: jnp.ndarray,
    ) -> jnp.ndarray:
        return forward_loss(
            self.params, self.cfg, input_ids, attention_mask, labels
        )
