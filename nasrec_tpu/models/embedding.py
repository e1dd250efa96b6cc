"""Fused multi-table embedding stem.

The reference keeps one `nn.Embedding` per categorical slot and runs 26
independent gathers per batch (ref: nasrec/supernet/supernet.py:404-430).
TPU-native design: all tables are concatenated row-wise into ONE
[total_vocab, emb_dim] array with per-slot row offsets, so the stem is a
single gather of [B*S] indices — one fused HBM access, and the natural unit
for row-sharding across a `model` mesh axis (see nasrec_tpu/parallel/).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.ops.common import embedding_init


def table_offsets(vocab_sizes: Sequence[int]) -> np.ndarray:
    """Starting row of each per-slot table inside the fused table."""
    return np.concatenate([[0], np.cumsum(np.asarray(vocab_sizes))[:-1]]).astype(np.int32)


def embedding_stem_init(key, vocab_sizes: Sequence[int], emb_dim: int) -> Dict:
    """One fused table.  Per-slot sub-tables are xavier-normal initialised with
    their own fan-in (matching per-table nn.Embedding init statistics,
    ref: nasrec/utils/train_utils.py:76-77)."""
    total = int(np.sum(vocab_sizes))
    keys = jax.random.split(key, len(vocab_sizes))
    parts = [embedding_init(k, int(v), emb_dim) for k, v in zip(keys, vocab_sizes)]
    return {"table": jnp.concatenate(parts, axis=0)}


def load_embedding_from_checkpoint(params: Dict, ckpt_path: str) -> Dict:
    """Seed the fused embedding table from another checkpoint's table
    (parity with seeding from a DLRM checkpoint, ref: nasrec/supernet/
    supernet.py:368-383).  Shapes must match exactly."""
    from nasrec_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(ckpt_path)
    src = ckpt["params"]["embedding"]["table"]
    dst = params["embedding"]["table"]
    if tuple(src.shape) != tuple(dst.shape):
        raise ValueError(
            f"embedding table shape mismatch: ckpt {src.shape} vs model {dst.shape}"
        )
    out = dict(params)
    out["embedding"] = {**params["embedding"], "table": jnp.asarray(src)}
    return out


def embedding_stem_apply(
    params: Dict,
    cat_x: jnp.ndarray,  # [B, S] int32 per-slot indices
    offsets: np.ndarray,  # [S] int32 (static)
) -> jnp.ndarray:
    """Lookup -> [B, S, emb_dim] via a single fused gather."""
    idx = cat_x + jnp.asarray(offsets)[None, :]
    return jnp.take(params["table"], idx, axis=0)
