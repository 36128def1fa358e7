"""Tactic generation: beam search, generator model wrappers, preprocessing."""

from reprover_tpu.generation.beam_search import BeamSearchResult, beam_search
from reprover_tpu.generation.generator import TacticGeneratorModel

__all__ = [
    "BeamSearchResult",
    "beam_search",
    "TacticGeneratorModel",
    "CausalTacticGeneratorModel",
    "CausalGeneratorDataModule",
    "TacticBpeTokenizer",
]


def __getattr__(name: str) -> object:
    # Lazy: the causal generator pulls in transformers (tokenizer) only when
    # a decoder-only checkpoint is actually used.
    if name == "CausalTacticGeneratorModel":
        from reprover_tpu.generation.causal_generator import (
            CausalTacticGeneratorModel,
        )

        return CausalTacticGeneratorModel
    if name == "CausalGeneratorDataModule":
        from reprover_tpu.generation.causal_datamodule import (
            CausalGeneratorDataModule,
        )

        return CausalGeneratorDataModule
    if name == "TacticBpeTokenizer":
        from reprover_tpu.generation.bpe_tokenizer import TacticBpeTokenizer

        return TacticBpeTokenizer
    raise AttributeError(name)
