"""Row-sharded embedding tables with explicit XLA collectives.

The fused [total_vocab, emb_dim] table (nasrec_tpu/models/embedding.py) is
row-sharded across the `model` mesh axis.  A lookup becomes, per model shard:

    local rows  = clip(idx - shard_start, 0, rows_local-1)
    partial     = table_local[local rows] * owned_mask
    result      = psum(partial, axis="model")

i.e. every shard gathers the rows it owns and the per-slot vectors are
combined with one all-reduce over ICI.  This is the masked-gather + psum
formulation of the all-to-all embedding exchange (BASELINE.json north star);
its VJP is a local scatter-add into each shard — embedding gradients never
leave the owning device.

Implemented with shard_map so the collective is explicit and predictable
rather than left to the GSPMD partitioner's gather heuristics.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def pad_table_for_sharding(params: Dict, num_shards: int) -> Dict:
    """Pad the fused table's row count to a multiple of `num_shards` (padding
    rows are never indexed; they exist only to make sharding even)."""
    table = params["table"]
    rows = table.shape[0]
    padded = (rows + num_shards - 1) // num_shards * num_shards
    if padded != rows:
        table = jnp.concatenate(
            [table, jnp.zeros((padded - rows, table.shape[1]), table.dtype)], axis=0
        )
    return {**params, "table": table}


def _lookup_shard(table_local: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-shard body: gather owned rows, zero the rest, psum over `model`."""
    rows_local = table_local.shape[0]
    shard = jax.lax.axis_index("model")
    local = idx - shard * rows_local
    owned = (local >= 0) & (local < rows_local)
    safe = jnp.clip(local, 0, rows_local - 1)
    partial_out = jnp.take(table_local, safe, axis=0)
    partial_out = partial_out * owned[..., None].astype(partial_out.dtype)
    return jax.lax.psum(partial_out, "model")


def make_sharded_stem_lookup(mesh: Mesh):
    """Returns lookup(params, cat_x, offsets) -> [B, S, E] with the table
    sharded P("model", None) and the batch sharded P("data", None).

    Drop-in replacement for the dense-gather stem
    (models/embedding.embedding_stem_apply) inside a jit over `mesh`.
    """

    mapped = shard_map(
        _lookup_shard,
        mesh=mesh,
        in_specs=(P("model", None), P("data", None)),
        out_specs=P("data", None, None),
    )

    def lookup(params: Dict, cat_x: jnp.ndarray, offsets: np.ndarray) -> jnp.ndarray:
        idx = cat_x + jnp.asarray(offsets)[None, :]
        return mapped(params["table"], idx)

    return lookup
