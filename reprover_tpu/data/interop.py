"""Interop with reference-produced pickle artifacts.

The reference pickles `predictions.pickle` / `*_results.pickle` containing
instances of its own classes (``common.Context``, ``common.Premise``,
``lean_dojo...Pos``). A user switching to this framework can load those
artifacts directly: :func:`load_reference_pickle` remaps the reference's
class paths onto this framework's structurally-compatible classes at
unpickle time (field names match by design — `common.py:34-106`).
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict, Tuple

from reprover_tpu.data.corpus import Context, Premise
from reprover_tpu.data.pos import Pos

#: (module, qualname) -> replacement class
_CLASS_MAP: Dict[Tuple[str, str], Any] = {
    ("common", "Premise"): Premise,
    ("common", "Context"): Context,
    ("common", "Pos"): Pos,
    ("lean_dojo.data_extraction.lean", "Pos"): Pos,
    ("lean_dojo.utils", "Pos"): Pos,
    ("lean_dojo", "Pos"): Pos,
}


class _RemappingUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str) -> Any:
        mapped = _CLASS_MAP.get((module, name))
        if mapped is not None:
            return mapped
        # Reference modules that aren't mapped cannot (and should not) load.
        if module == "common" or module.startswith(("lean_dojo", "prover.")):
            raise pickle.UnpicklingError(
                f"no mapping for reference class {module}.{name}"
            )
        return super().find_class(module, name)


def load_reference_pickle(path_or_file: Any) -> Any:
    """Load a pickle written by the reference (or by this framework)."""
    if hasattr(path_or_file, "read"):
        return _RemappingUnpickler(path_or_file).load()
    with open(path_or_file, "rb") as f:
        return _RemappingUnpickler(f).load()


def loads_reference_pickle(data: bytes) -> Any:
    return _RemappingUnpickler(io.BytesIO(data)).load()
