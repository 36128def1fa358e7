"""Tactic generation: beam search, generator model wrapper, preprocessing."""

from reprover_tpu.generation.beam_search import BeamSearchResult, beam_search
from reprover_tpu.generation.generator import TacticGeneratorModel

__all__ = ["BeamSearchResult", "beam_search", "TacticGeneratorModel"]
