"""Native C++ TSV parser: exact parity with the NumPy transforms + speed."""

import time

import numpy as np
import pytest

from nasrec_tpu.config import DATASETS
from nasrec_tpu.data.transforms import get_transform
from nasrec_tpu.data.native import native_available, parse_ctr_buffer

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable / native build failed"
)


def _make_lines(dataset, n, rng, missing_rate=0.15, short_rate=0.1):
    spec = DATASETS[dataset]
    lines = []
    for _ in range(n):
        label = str(rng.randint(0, 2))
        ints = [
            "" if rng.rand() < missing_rate else str(rng.randint(-3, 1000))
            for _ in range(spec.num_dense)
        ]
        cats = [
            "" if rng.rand() < missing_rate else format(rng.randint(0, 1 << 31), "x")
            for _ in range(spec.num_sparse)
        ]
        fields = [label] + ints + cats
        if rng.rand() < short_rate:  # short row (trailing fields missing)
            fields = fields[: rng.randint(1, len(fields))]
        lines.append("\t".join(fields))
    return lines


@pytest.mark.parametrize("dataset", ["criteo-kaggle", "avazu", "kdd"])
def test_native_matches_python(dataset, rng):
    spec = DATASETS[dataset]
    transform = get_transform(dataset)
    lines = _make_lines(dataset, 500, rng)
    want = transform([l.split("\t") for l in lines])
    buf = ("\n".join(lines) + "\n").encode()
    dense, cats, labels = parse_ctr_buffer(
        buf, spec.num_dense, spec.num_sparse, transform.vocab, transform.zero_dense
    )
    np.testing.assert_allclose(dense, want[0], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(cats, want[1])
    np.testing.assert_array_equal(labels, want[2])


def test_native_in_pipeline(tmp_path, rng):
    from nasrec_tpu.data.pipeline import _read_batches

    transform = get_transform("criteo-kaggle")
    lines = _make_lines("criteo-kaggle", 100, rng)
    p = tmp_path / "train.txt"
    p.write_text("\n".join(lines) + "\n")
    native = list(_read_batches(str(p), 32, transform, use_native=True))
    python = list(_read_batches(str(p), 32, transform, use_native=False))
    assert len(native) == len(python) == 4
    for a, b in zip(native, python):
        np.testing.assert_allclose(a[0], b[0], rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])


def test_native_throughput(rng):
    """The native parser must beat the Python path by a wide margin."""
    spec = DATASETS["criteo-kaggle"]
    transform = get_transform("criteo-kaggle")
    lines = _make_lines("criteo-kaggle", 20000, rng, short_rate=0.0)
    buf = ("\n".join(lines) + "\n").encode()
    rows = [l.split("\t") for l in lines]

    t0 = time.perf_counter()
    parse_ctr_buffer(buf, spec.num_dense, spec.num_sparse, transform.vocab, False)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    transform(rows)
    t_python = time.perf_counter() - t0
    rate = 20000 / t_native
    assert rate > 300_000, f"native parser too slow: {rate:.0f} rows/s"
    assert t_native < t_python, (t_native, t_python)
