"""Device-mesh construction for (data, model) SPMD.

The reference has no distributed training (SURVEY.md §2.9); this layer is the
TPU-native scale-out design: a 2-D mesh with a `data` axis (batch sharding,
gradient all-reduce emitted by XLA) and a `model` axis (row-sharded embedding
tables with explicit collectives over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    model: int = 1,
    data: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes ("data", "model"); data fills the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data * model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
