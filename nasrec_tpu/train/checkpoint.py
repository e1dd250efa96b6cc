"""Checkpoint IO: whole-state pickle of numpy-ified pytrees.

Single-host equivalent of the reference's torch.save checkpoints
(ref: nasrec/utils/io_utils.py:59-79), carrying params + optimizer state +
step + sampler RNG state.  Multi-host sharded checkpointing lives in
nasrec_tpu/parallel (per-host table shards).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
