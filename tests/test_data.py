"""Data-layer tests: transforms, shard pipeline, binary cache."""

import os

import numpy as np
import pytest

from nasrec_tpu.config import DATASETS
from nasrec_tpu.data import (
    batch_iterator,
    build_binary_cache,
    get_transform,
    open_binary_cache,
    prefetch,
    shard_paths,
)
from nasrec_tpu.data.transforms import fmod_index, hex_to_int, log1p_dense


def test_hex_parse_and_fmod():
    x = hex_to_int(["ff", "", "0", "a1b2"])
    np.testing.assert_array_equal(x, [255, -1, 0, 41394])
    # torch-fmod semantics: -1 -> 0 (missing bucket); others in [1, vocab-1]
    idx = fmod_index(x, vocab=100)
    np.testing.assert_array_equal(idx, [255 % 99 + 1, 0, 1, 41394 % 99 + 1])
    assert idx.min() >= 0 and idx.max() < 100


def test_log1p_dense_clamps_negatives():
    x = np.array([[-5.0, 0.0, 1.0]], np.float32)
    np.testing.assert_allclose(
        log1p_dense(x), np.log([[1.0, 1.0, 2.0]]), rtol=1e-6
    )


def _write_shards(tmp_path, dataset, rows_per_shard, num_shards=3, split="train"):
    spec = DATASETS[dataset]
    rng = np.random.RandomState(0)
    for s in range(num_shards):
        d = tmp_path / f"shard-{s}"
        d.mkdir(exist_ok=True)
        lines = []
        for r in range(rows_per_shard):
            label = str(rng.randint(0, 2))
            ints = [str(rng.randint(-2, 100)) for _ in range(spec.num_dense)]
            cats = [
                format(rng.randint(0, 1 << 30), "x") if rng.rand() > 0.1 else ""
                for _ in range(spec.num_sparse)
            ]
            lines.append("\t".join([label] + ints + cats))
        (d / f"{split}.txt").write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def test_criteo_pipeline_end_to_end(tmp_path):
    root = _write_shards(tmp_path, "criteo-kaggle", rows_per_shard=50)
    paths = shard_paths(root, "train")
    assert len(paths) == 3
    transform = get_transform("criteo-kaggle")
    batches = list(batch_iterator(paths, 20, transform))
    # 3 shards x 50 rows with batch 20 -> 2 full batches per shard (drop 10)
    assert len(batches) == 6
    dense, cat, y = batches[0]
    assert dense.shape == (20, 13) and dense.dtype == np.float32
    assert cat.shape == (20, 26) and cat.dtype == np.int32
    assert y.shape == (20, 1)
    vocab = np.asarray(DATASETS["criteo-kaggle"].vocab_sizes())
    for b in batches:
        assert (b[1] >= 0).all() and (b[1] < vocab[None, :]).all()


def test_vocab_cap_applies_to_transform(tmp_path):
    root = _write_shards(tmp_path, "criteo-kaggle", rows_per_shard=30)
    transform = get_transform("criteo-kaggle", cap=1000)
    batches = list(
        batch_iterator(shard_paths(root, "train"), 30, transform)
    )
    for b in batches:
        assert b[1].max() < 1000


def test_avazu_dense_is_zero(tmp_path):
    root = _write_shards(tmp_path, "avazu", rows_per_shard=20)
    transform = get_transform("avazu")
    (dense, cat, y) = next(iter(batch_iterator(shard_paths(root, "train"), 10, transform)))
    assert (dense == 0).all()
    assert cat.shape[1] == 23


def test_host_shard_assignment(tmp_path):
    root = _write_shards(tmp_path, "criteo-kaggle", rows_per_shard=10, num_shards=5)
    p0 = shard_paths(root, "train", host_id=0, num_hosts=2)
    p1 = shard_paths(root, "train", host_id=1, num_hosts=2)
    assert len(p0) == 3 and len(p1) == 2
    assert set(p0).isdisjoint(p1)


def test_prefetch_preserves_order():
    items = list(range(50))
    assert list(prefetch(iter(items), depth=3)) == items


def test_binary_cache_roundtrip(tmp_path):
    root = _write_shards(tmp_path, "kdd", rows_per_shard=40)
    out = tmp_path / "cache"
    prefix = build_binary_cache("kdd", root, "train", str(out))
    assert os.path.exists(prefix + ".dense.npy")
    batches = list(open_binary_cache(prefix, 32))
    assert len(batches) == 120 // 32
    dense, cat, y = batches[0]
    assert dense.shape == (32, 3) and cat.shape == (32, 10)
    # Cache contents must equal streaming the TSV directly.
    direct = list(
        batch_iterator(
            shard_paths(root, "train"), 40, get_transform("kdd"), interleave=False
        )
    )
    np.testing.assert_array_equal(direct[0][0], np.load(prefix + ".dense.npy")[:40])


def test_binary_cache_shuffle_is_permutation(tmp_path):
    root = _write_shards(tmp_path, "kdd", rows_per_shard=16, num_shards=1)
    prefix = build_binary_cache("kdd", root, "train", str(tmp_path / "c"))
    plain = np.concatenate([b[2] for b in open_binary_cache(prefix, 8)])
    shuffled = np.concatenate(
        [b[2] for b in open_binary_cache(prefix, 8, shuffle=True, seed=1)]
    )
    assert sorted(plain.ravel().tolist()) == sorted(shuffled.ravel().tolist())


def test_synthetic_interactions_planted():
    from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_arrays

    spec = SyntheticSpec(num_dense=4, num_sparse=8, vocab=50,
                         signal_scale=0.5, interaction_pairs=6,
                         interaction_scale=3.0)
    d1, c1, y1 = synthetic_arrays(2000, spec, seed=0)
    d2, c2, y2 = synthetic_arrays(2000, spec, seed=0)
    np.testing.assert_array_equal(y1, y2)  # deterministic
    # The interaction term must change labels vs the first-order-only model.
    spec0 = SyntheticSpec(num_dense=4, num_sparse=8, vocab=50,
                          signal_scale=0.5, interaction_pairs=0)
    _, _, y0 = synthetic_arrays(2000, spec0, seed=0)
    assert (y1 != y0).mean() > 0.05
    assert 0.2 < y1.mean() < 0.8


def test_device_prefetch_preserves_batches(tmp_path):
    from nasrec_tpu.data.pipeline import device_prefetch

    rng = np.random.RandomState(0)
    batches = [
        (rng.randn(4, 3).astype(np.float32),
         rng.randint(0, 9, (4, 2)).astype(np.int32),
         rng.randint(0, 2, (4, 1)).astype(np.float32))
        for _ in range(5)
    ]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    for (a, b, c), (x, y, z) in zip(batches, out):
        np.testing.assert_array_equal(a, np.asarray(x))
        np.testing.assert_array_equal(c, np.asarray(z))


def test_build_cache_cli(tmp_path):
    from nasrec_tpu.tools.build_cache import main

    root = _write_shards(tmp_path, "kdd", rows_per_shard=30)
    main(["--dataset", "kdd", "--root_dir", root, "--split", "train",
          "--out_dir", str(tmp_path / "cache")])
    assert (tmp_path / "cache" / "train-h0.dense.npy").exists()
