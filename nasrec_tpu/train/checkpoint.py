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


# ---------------------------------------------------------------------------
# Orbax backend (optional): async, multi-host-aware checkpointing of array
# pytrees.  Use for long production runs; the pickle path stays the default
# for its zero-dependency portability.
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path: str, tree: Any, *, wait: bool = True) -> None:
    """Save an array pytree with orbax (async unless wait=False is overridden).

    `tree` must contain only arrays (e.g. {"params": ..., "opt_state": ...,
    "step": jnp scalar}); python scalars/strings should ride in a sidecar
    json (orbax StandardCheckpointer handles array pytrees)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    if wait:
        ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, like: Any = None) -> Any:
    """Restore an orbax checkpoint; `like` (an abstract/concrete pytree of the
    same structure) restores with matching shardings/dtypes when given."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), like)
    return ckptr.restore(os.path.abspath(path))
