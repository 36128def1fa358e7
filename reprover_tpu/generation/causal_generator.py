"""Decoder-only tactic generator: causal LM + batched beam search.

The reference serves decoder-only checkpoints through its causal-LM fallback
(`/root/reference/prover/tactic_generator.py:187-192,237-238` — generate,
then strip the echoed prompt) and through vLLM with the ``[GOAL]\\n{state}\\n
[PROOFSTEP]\\n`` template (`tactic_generator.py:301-322`). This wrapper is
the TPU-native equivalent: left-padded prompt prefill fills the KV cache,
then the shared fixed-shape beam search continues from each prompt's last
token — no prompt echo to strip, since decoding starts after the prompt.

The tokenizer is the checkpoint's own (HF ``AutoTokenizer``; decoder-only
models are subword, not byte-level).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reprover_tpu.generation.beam_search import BeamSearchResult, beam_search
from reprover_tpu.models.causal_lm import (
    CausalDecodeState,
    CausalLMConfig,
    Params,
    decode_step,
    prefill,
)

# Single source of truth with the fine-tuning data exporter: the serving
# prompt must match the training instruction byte-for-byte (the measured
# train/search-skew class — see RetrievalAugmentedTacticGenerator.generate).
from reprover_tpu.generation.preprocess import TEMPLATE as GOAL_TEMPLATE


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


class CausalTacticGeneratorModel:
    """Decoder-only model wrapper with the TacticGeneratorModel interface."""

    def __init__(
        self,
        params: Params,
        cfg: CausalLMConfig,
        tokenizer: Any,  # HF tokenizer (or anything with __call__/batch_decode)
        max_inp_seq_len: int,
        max_oup_seq_len: int,
        length_penalty: float = 0.0,
        template: str = GOAL_TEMPLATE,
        bucket_multiple: int = 128,
        quantize: "bool | str" = False,
    ) -> None:
        if quantize:
            # Weight-only int8 serving: half the weight HBM stream, near-
            # lossless beams (role of vLLM's quantization options for the
            # decoder-only family, `/root/reference/prover/proof_search.py:332-366`).
            # "int4" quarters it (packed nibbles, per-group scales).
            from reprover_tpu.models.quantize import (
                quantize_causal_params,
                resolve_quantize_bits,
            )

            params = quantize_causal_params(
                params, bits=resolve_quantize_bits(quantize)
            )
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_inp_seq_len = max_inp_seq_len
        self.max_oup_seq_len = max_oup_seq_len
        self.length_penalty = length_penalty
        self.template = template
        self.bucket_multiple = bucket_multiple

        @partial(jax.jit, static_argnames=("num_beams", "max_new"))
        def _generate_jit(params, input_ids, attention_mask, num_beams, max_new):
            cfg_ = self.cfg
            b, p = input_ids.shape
            # Prefill everything but each prompt's LAST real token (left
            # padding ⇒ it is the final column); beam search starts from it.
            _, cache = prefill(
                params,
                cfg_,
                input_ids[:, :-1],
                attention_mask[:, :-1],
                max_decode_len=max_new + 1,
            )
            start_tokens = input_ids[:, -1]

            def tile(x):
                return jnp.repeat(x, num_beams, axis=0)

            cache = CausalDecodeState(
                k=jnp.repeat(cache.k, num_beams, axis=1),
                v=jnp.repeat(cache.v, num_beams, axis=1),
                key_mask=tile(cache.key_mask),
                step=cache.step,
                position=tile(cache.position),
            )

            def step_fn(cache, tokens):
                return decode_step(params, cfg_, cache, tokens)

            def reorder_fn(cache, flat_parent):
                return CausalDecodeState(
                    k=jnp.take(cache.k, flat_parent, axis=1),
                    v=jnp.take(cache.v, flat_parent, axis=1),
                    key_mask=jnp.take(cache.key_mask, flat_parent, axis=0),
                    step=cache.step,
                    position=jnp.take(cache.position, flat_parent, axis=0),
                )

            return beam_search(
                step_fn,
                reorder_fn,
                cache,
                batch_size=b,
                num_beams=num_beams,
                max_length=max_new + 1,  # counts the start (last prompt) token
                eos_id=cfg_.eos_token_id,
                pad_id=cfg_.pad_token_id,
                start_id=start_tokens,
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
        template: str = GOAL_TEMPLATE,
        compute_dtype: Any = None,
        quantize: "bool | str" = False,
    ) -> "CausalTacticGeneratorModel":
        from transformers import AutoTokenizer

        from reprover_tpu.models.hf_import_causal import load_hf_causal_lm

        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
            )
        params, cfg = load_hf_causal_lm(ckpt_dir, compute_dtype=compute_dtype)
        tokenizer = AutoTokenizer.from_pretrained(ckpt_dir)
        return cls(
            params, cfg, tokenizer, max_inp_seq_len, max_oup_seq_len,
            length_penalty, template, quantize=quantize,
        )

    def _tokenize(self, prompts: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tok = self.tokenizer
        encoded = [tok(p, add_special_tokens=True)["input_ids"] for p in prompts]
        encoded = [ids[-self.max_inp_seq_len :] for ids in encoded]
        longest = max(len(ids) for ids in encoded)
        width = min(
            _round_up(max(longest, 2), self.bucket_multiple), self.max_inp_seq_len
        )
        width = max(width, 2)  # prefill needs >= 1 column before the start token
        pad_id = self.cfg.pad_token_id
        ids = np.full((len(encoded), width), pad_id, np.int32)
        mask = np.zeros((len(encoded), width), np.int32)
        for i, row in enumerate(encoded):
            row = row[-width:]
            ids[i, width - len(row) :] = row  # LEFT padding
            mask[i, width - len(row) :] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

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
        from reprover_tpu.generation.causal_engine import CausalStepwiseEngine

        return CausalStepwiseEngine(
            self.params,
            self.cfg,
            num_slots=num_slots,
            num_beams=num_beams,
            max_src_len=self.max_inp_seq_len,
            # +1: like the classic path's ``max_new + 1``, the decode length
            # counts the start token (the prompt's last real token).
            max_decode_len=self.max_oup_seq_len + 1,
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
        """Template + LEFT-pad every admission row to exactly
        ``max_inp_seq_len`` (the engine's fixed prompt bucket), keeping the
        prompt TAIL on truncation like ``_tokenize``."""
        prompts = [self.template % s for s in states]
        tok = self.tokenizer
        encoded = [
            tok(p, add_special_tokens=True)["input_ids"] for p in prompts
        ]
        width = self.max_inp_seq_len
        pad_id = self.cfg.pad_token_id
        ids = np.full((len(encoded), width), pad_id, np.int32)
        mask = np.zeros((len(encoded), width), np.int32)
        for i, row in enumerate(encoded):
            row = row[-width:]
            ids[i, width - len(row):] = row
            mask[i, width - len(row):] = 1
        return ids, mask

    def decode_candidates(
        self, seqs: np.ndarray, scores: np.ndarray, lens: np.ndarray
    ) -> List[Tuple[str, float]]:
        """Finalized engine beams -> (text, score), matching ``generate``:
        skip column 0 (the prompt's last token), strip eos/pad."""
        out = []
        for k in range(len(scores)):
            toks = seqs[k, 1 : lens[k]].tolist()
            toks = [
                t
                for t in toks
                if t not in (self.cfg.eos_token_id, self.cfg.pad_token_id)
            ]
            text = self.tokenizer.decode(toks, skip_special_tokens=True)
            out.append((text.strip(), float(scores[k])))
        return out

    def generate(
        self,
        states: Sequence[str],
        num_samples: int,
        max_length: Optional[int] = None,
    ) -> List[List[Tuple[str, float]]]:
        """Beam-search candidates per state; template applied here
        (`tactic_generator.py:317`). Returns (text, score) descending."""
        prompts = [self.template % s for s in states]
        ids, mask = self._tokenize(prompts)
        max_new = max_length or self.max_oup_seq_len
        result: BeamSearchResult = self._generate_jit(
            self.params, ids, mask, num_beams=num_samples, max_new=max_new
        )
        sequences = np.asarray(result.sequences)
        scores = np.asarray(result.scores)
        lengths = np.asarray(result.lengths)
        out: List[List[Tuple[str, float]]] = []
        for b in range(len(states)):
            row = []
            for k in range(num_samples):
                # Position 0 is the prompt's last token — skip it; the rest
                # is pure continuation (no prompt echo).
                toks = sequences[b, k, 1 : lengths[b, k]].tolist()
                toks = [
                    t
                    for t in toks
                    if t not in (self.cfg.eos_token_id, self.cfg.pad_token_id)
                ]
                text = self.tokenizer.decode(toks, skip_special_tokens=True)
                row.append((text.strip(), float(scores[b, k])))
            out.append(row)
        return out
