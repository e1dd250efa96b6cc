"""Host-side input pipeline: shard discovery, interleaved streaming, prefetch.

Replaces the reference's DataLoader + ParallelReadConcat worker-per-shard
scheme (ref: nasrec/torchrec/utils.py:263-302, nasrec/main_train.py:94-103)
with a TPU-friendly pipeline:

  - shard directories `shard-*/` are discovered and assigned round-robin to
    hosts (`shard_idx % num_hosts == host_id`) for multi-host training;
  - each shard is streamed line-by-line, batched, and transformed with
    vectorized NumPy; batches from this host's shards are interleaved
    round-robin (same mixing effect as worker-per-shard);
  - a background prefetch thread keeps a small queue of ready host batches so
    the accelerator never waits on text parsing;
  - for production-rate feeding, convert shards once to a binary cache
    (nasrec_tpu/data/cache.py) and stream memmapped batches instead.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from nasrec_tpu.data.transforms import get_transform


def shard_paths(
    root_dir: str,
    split: str,
    host_id: int = 0,
    num_hosts: int = 1,
) -> List[str]:
    """This host's shard files, e.g. root/shard-3/train.txt
    (ref shard layout: nasrec/tools/autoctr_split_data_*.py)."""
    dirs = sorted(glob.glob(os.path.join(root_dir, "shard-*")))
    if not dirs:
        raise FileNotFoundError(f"no shard-* dirs under {root_dir}")
    mine = [d for i, d in enumerate(dirs) if i % num_hosts == host_id]
    return [os.path.join(d, f"{split}.txt") for d in mine]


def _read_batches(
    path: str, batch_size: int, transform: Callable, use_native: str | bool = "auto"
) -> Iterator:
    """Stream one shard as transformed batches.

    Uses the multithreaded C++ parser (data/native/, ~100x the Python rate)
    when it is available and the transform carries dataset metadata; falls
    back to the pure-Python row parser otherwise.
    """
    if use_native in ("auto", True) and hasattr(transform, "vocab"):
        from nasrec_tpu.data.native import native_available, read_batches_native

        if native_available():
            yield from read_batches_native(
                path, batch_size, transform.num_dense, transform.num_sparse,
                transform.vocab, transform.zero_dense,
            )
            return
        if use_native is True:
            raise RuntimeError("native parser requested but unavailable")
    rows: List[List[str]] = []
    with open(path, "r") as f:
        for line in f:
            rows.append(line.rstrip("\n").split("\t"))
            if len(rows) == batch_size:
                yield transform(rows)
                rows = []
    if rows:
        yield transform(rows)


def batch_iterator(
    paths: List[str],
    batch_size: int,
    transform: Callable,
    *,
    drop_remainder: bool = True,
    interleave: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Round-robin interleave of per-shard batch streams."""
    if interleave and len(paths) > 1:
        streams = [_read_batches(p, batch_size, transform) for p in paths]
        alive = list(streams)
        while alive:
            nxt = []
            for s in alive:
                try:
                    batch = next(s)
                    if drop_remainder and len(batch[2]) < batch_size:
                        continue
                    yield batch
                    nxt.append(s)
                except StopIteration:
                    pass
            alive = nxt
    else:
        for p in paths:
            for batch in _read_batches(p, batch_size, transform):
                if drop_remainder and len(batch[2]) < batch_size:
                    continue
                yield batch


def prefetch(it: Iterable, depth: int = 4) -> Iterator:
    """Run `it` in a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _done = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _done:
            return
        yield item


def device_prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Move batches to the accelerator `depth` steps ahead of consumption, so
    host->device transfer overlaps device compute (the last host-side piece
    of the input pipeline; pairs with the binary cache for production runs)."""
    import collections

    import jax

    buf = collections.deque()
    it = iter(it)
    try:
        for _ in range(depth):
            buf.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield out


def make_dataset_iterators(
    dataset: str,
    root_dir: str,
    *,
    train_batch_size: int,
    test_batch_size: int,
    train_split: str = "trainval",
    validate_split: str = "test",
    vocab_cap: Optional[int] = None,
    host_id: int = 0,
    num_hosts: int = 1,
    prefetch_depth: int = 4,
):
    """(train_iter_fn, test_iter_fn) mirroring get_*_kaggle_pipes
    (ref: nasrec/utils/data_pipes.py:36-133)."""
    transform = get_transform(dataset, vocab_cap)
    train_paths = shard_paths(root_dir, train_split, host_id, num_hosts)
    test_paths = shard_paths(root_dir, validate_split, host_id, num_hosts)

    def train_iter():
        return prefetch(
            batch_iterator(train_paths, train_batch_size, transform),
            depth=prefetch_depth,
        )

    def test_iter():
        return prefetch(
            batch_iterator(
                test_paths, test_batch_size, transform, drop_remainder=False
            ),
            depth=prefetch_depth,
        )

    return train_iter, test_iter
