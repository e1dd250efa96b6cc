"""Binary cache: one-time TSV -> memmap conversion for TPU-rate feeding.

Parsing 36M+ text rows per epoch cannot keep a TPU fed (SURVEY.md §7 hard
part d).  `build_binary_cache` converts a split once into three memmapped
arrays (dense f32, cat i32, label f32); `open_binary_cache` then yields
batches at memory bandwidth with zero per-epoch parsing.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from nasrec_tpu.config import DATASETS
from nasrec_tpu.data.pipeline import batch_iterator, shard_paths
from nasrec_tpu.data.transforms import get_transform


def build_binary_cache(
    dataset: str,
    root_dir: str,
    split: str,
    out_dir: str,
    *,
    vocab_cap: Optional[int] = None,
    chunk_rows: int = 65536,
    host_id: int = 0,
    num_hosts: int = 1,
) -> str:
    """Parse this host's shards of `split` into {out_dir}/{split}-h{host}.*"""
    spec = DATASETS[dataset]
    os.makedirs(out_dir, exist_ok=True)
    prefix = os.path.join(out_dir, f"{split}-h{host_id}")
    transform = get_transform(dataset, vocab_cap)
    paths = shard_paths(root_dir, split, host_id, num_hosts)

    dense_parts, cat_parts, y_parts = [], [], []
    for dense, cat, y in batch_iterator(
        paths, chunk_rows, transform, drop_remainder=False, interleave=False
    ):
        dense_parts.append(dense)
        cat_parts.append(cat)
        y_parts.append(y)
    dense = np.concatenate(dense_parts)
    cat = np.concatenate(cat_parts)
    y = np.concatenate(y_parts)

    np.save(prefix + ".dense.npy", dense)
    np.save(prefix + ".cat.npy", cat)
    np.save(prefix + ".label.npy", y)
    with open(prefix + ".meta.json", "w") as f:
        json.dump(
            {
                "dataset": dataset,
                "rows": int(len(y)),
                "num_dense": spec.num_dense,
                "num_sparse": spec.num_sparse,
                "vocab_cap": vocab_cap,
            },
            f,
        )
    return prefix


def open_binary_cache(
    prefix: str,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = True,
    loop: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Stream batches from a binary cache (memmapped; O(1) startup)."""
    dense = np.load(prefix + ".dense.npy", mmap_mode="r")
    cat = np.load(prefix + ".cat.npy", mmap_mode="r")
    y = np.load(prefix + ".label.npy", mmap_mode="r")
    n = len(y)
    rng = np.random.RandomState(seed)
    while True:
        order = rng.permutation(n) if shuffle else None
        stop = n - batch_size + 1 if drop_remainder else n
        for start in range(0, stop, batch_size):
            sl = slice(start, min(start + batch_size, n))
            if order is None:
                yield np.asarray(dense[sl]), np.asarray(cat[sl]), np.asarray(y[sl])
            else:
                idx = np.sort(order[sl])  # sorted gather keeps memmap IO local
                yield dense[idx], cat[idx], y[idx]
        if not loop:
            return
