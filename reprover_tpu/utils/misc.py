"""Small glue utilities (`/root/reference/common.py:428-443` roles)."""

from __future__ import annotations

import logging
import sys
from typing import Any


def zip_strict(*args: Any) -> Any:
    """zip() asserting equal lengths (`common.py:428-430`)."""
    lengths = {len(a) for a in args if hasattr(a, "__len__")}
    assert len(lengths) <= 1, f"zip_strict length mismatch: {lengths}"
    return zip(*args)


def set_logger(verbose: bool) -> None:
    """Global verbosity switch (`common.py:433-443`, loguru -> logging)."""
    logging.basicConfig(
        stream=sys.stderr,
        level=logging.DEBUG if verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        force=True,
    )
