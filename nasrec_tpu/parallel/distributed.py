"""Multi-host utilities: jax.distributed bring-up and sharded checkpoints.

The reference is single-process/single-GPU (SURVEY.md §2.9); this module is
the TPU-native scale-out glue:

  - `initialize()` wraps jax.distributed.initialize (no-op single-host);
  - per-host data sharding comes from data/pipeline.shard_paths(host_id,
    num_hosts) with process_index/process_count;
  - `save_sharded_checkpoint` / `load_sharded_checkpoint` write the
    row-sharded embedding table per host (each process stores only its local
    table+accumulator rows; replicated params are written by host 0 only).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import numpy as np
import jax

from nasrec_tpu.train.loop import TrainState


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed when running multi-host (no-op otherwise)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_info():
    return jax.process_index(), jax.process_count()


def fetch_array(x) -> np.ndarray:
    """Array -> host numpy, multi-process safe.

    Single-process (or fully-addressable) arrays take the plain device_get
    path.  A multi-process global array (e.g. batch-sharded logits) is
    all-gathered across processes first, so EVERY process gets the full
    value and host-side metrics stay identical to a single-process run.
    Collective: must be called by all processes in the same order."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def fetch_pytree(tree):
    """device_get with the fetch_array multi-process gather per leaf."""
    return jax.tree_util.tree_map(fetch_array, tree)


def _local_rows(total_rows: int, num_hosts: int, host: int):
    """Row range of this host's table shard (tables are padded to a multiple
    of the model-axis size, see parallel/embedding.pad_table_for_sharding)."""
    per = total_rows // num_hosts
    return host * per, (host + 1) * per


def save_sharded_checkpoint(
    path_dir: str, state: TrainState, extra: Optional[Dict[str, Any]] = None
) -> None:
    """Each host writes its local shard of the embedding table/accumulator;
    host 0 also writes the replicated remainder."""
    host, num_hosts = host_info()
    os.makedirs(path_dir, exist_ok=True)
    params = jax.device_get(state.params)
    opt = jax.device_get(state.opt_state)

    table = np.asarray(params["embedding"]["table"])
    acc = np.asarray(opt["embedding"]["table"])
    lo, hi = _local_rows(table.shape[0], num_hosts, host)
    with open(os.path.join(path_dir, f"table-shard-{host}.pkl"), "wb") as f:
        pickle.dump({"rows": (lo, hi), "table": table[lo:hi], "acc": acc[lo:hi]}, f)

    if host == 0:
        rest_p = {k: v for k, v in params.items() if k != "embedding"}
        rest_o = {k: v for k, v in opt.items() if k != "embedding"}
        with open(os.path.join(path_dir, "replicated.pkl"), "wb") as f:
            pickle.dump(
                {
                    "params": rest_p,
                    "opt_state": rest_o,
                    "step": int(state.step),
                    "table_rows": int(table.shape[0]),
                    "table_dim": int(table.shape[1]),
                    "num_hosts": num_hosts,
                    "extra": extra or {},
                },
                f,
            )


def load_sharded_checkpoint(path_dir: str) -> Dict[str, Any]:
    """Reassemble the full state on the host (numpy pytrees)."""
    with open(os.path.join(path_dir, "replicated.pkl"), "rb") as f:
        meta = pickle.load(f)
    rows, dim = meta["table_rows"], meta["table_dim"]
    table = np.zeros((rows, dim), np.float32)
    acc = np.zeros((rows, dim), np.float32)
    for h in range(meta["num_hosts"]):
        with open(os.path.join(path_dir, f"table-shard-{h}.pkl"), "rb") as f:
            shard = pickle.load(f)
        lo, hi = shard["rows"]
        table[lo:hi] = shard["table"]
        acc[lo:hi] = shard["acc"]
    params = dict(meta["params"])
    params["embedding"] = {"table": table}
    opt = dict(meta["opt_state"])
    opt["embedding"] = {"table": acc}
    return {
        "params": params,
        "opt_state": opt,
        "step": meta["step"],
        "extra": meta["extra"],
    }
