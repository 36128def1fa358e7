"""Device mesh construction.

Axes convention across the framework:

- ``data``  — batch/data parallelism and ZeRO-style optimizer-state sharding
  (the reference's DeepSpeed ZeRO-2 role, `retrieval/confs/*.yaml:6-11`).
- ``model`` — tensor parallelism for serving (the reference's vLLM
  ``tensor_parallel_size`` role, `prover/proof_search.py:345`).

Collectives implied by shardings ride ICI within a slice; multi-slice DCN
layouts put ``data`` outermost, which is the default here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over ``devices`` (default: all).

    ``data=None`` uses every device not consumed by ``model``. The ``model``
    axis is innermost so tensor-parallel collectives stay on adjacent chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    if data is None:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def local_mesh() -> Mesh:
    """A 1x1 mesh on the first device — single-chip paths without branches."""
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])
