"""Host-side data layer: corpus DAG, accessibility bitmasks, datasets."""

from reprover_tpu.data.pos import Pos
from reprover_tpu.data.corpus import (
    Context,
    Corpus,
    File,
    IndexedCorpus,
    Premise,
    PremiseSet,
)
from reprover_tpu.data.augment import (
    MARK_END_SYMBOL,
    MARK_START_SYMBOL,
    format_augmented_state,
    get_all_pos_premises,
    remove_marks,
)

__all__ = [
    "Pos",
    "Context",
    "Corpus",
    "File",
    "IndexedCorpus",
    "Premise",
    "PremiseSet",
    "MARK_START_SYMBOL",
    "MARK_END_SYMBOL",
    "format_augmented_state",
    "get_all_pos_premises",
    "remove_marks",
]
