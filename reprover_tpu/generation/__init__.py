"""Tactic generation: beam search, generator model wrappers, preprocessing."""

from reprover_tpu.generation.beam_search import BeamSearchResult, beam_search
from reprover_tpu.generation.generator import TacticGeneratorModel

__all__ = [
    "BeamSearchResult",
    "beam_search",
    "TacticGeneratorModel",
    "CausalTacticGeneratorModel",
]


def __getattr__(name: str) -> object:
    # Lazy: the causal generator pulls in transformers (tokenizer) only when
    # a decoder-only checkpoint is actually used.
    if name == "CausalTacticGeneratorModel":
        from reprover_tpu.generation.causal_generator import (
            CausalTacticGeneratorModel,
        )

        return CausalTacticGeneratorModel
    raise AttributeError(name)
