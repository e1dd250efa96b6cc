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


# ---------------------------------------------------------------------------
# Backend dispatch: one save/load surface for the workloads
# (--ckpt_backend {pickle,orbax}).
# ---------------------------------------------------------------------------

_SIDECAR = "sidecar.json"


def save_checkpoint_any(path: str, payload: Dict[str, Any],
                        backend: str = "pickle") -> None:
    """Save `payload` with the chosen backend.  Orbax checkpoints are a
    DIRECTORY at `path`: array entries go through orbax, non-array entries
    (config dicts, ints) ride in a json sidecar."""
    if backend == "pickle":
        save_checkpoint(path, payload)
        return
    if backend != "orbax":
        raise NotImplementedError(f"ckpt backend {backend}")
    import json

    arrays = {k: v for k, v in payload.items() if _is_array_tree(v)}
    extras = {k: v for k, v in payload.items() if k not in arrays}
    if os.path.isdir(path):  # orbax refuses overwrite without force anyway
        import shutil

        shutil.rmtree(path)
    save_checkpoint_orbax(os.path.join(path, "arrays"), _to_numpy(arrays))
    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump(extras, f, default=str)


def _is_array_tree(tree: Any) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    return bool(leaves) and all(
        isinstance(l, (np.ndarray, np.generic, jax.Array, int, float))
        and not isinstance(l, bool)
        for l in leaves
    )


def load_any_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint saved by either backend (orbax = directory)."""
    if os.path.isdir(path):
        import json

        payload = dict(load_checkpoint_orbax(os.path.join(path, "arrays")))
        sidecar = os.path.join(path, _SIDECAR)
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                payload.update(json.load(f))
        return payload
    return load_checkpoint(path)
