"""Synthetic CTR data with learnable structure, for tests and benchmarks.

Plays the role of the reference's NUM_EMBEDDINGS_TEST tiny-vocab fixture
(ref: nasrec/utils/config.py:41) but with an actual planted signal so
end-to-end convergence can be asserted: the label is Bernoulli of a logistic
model over the dense features plus per-slot categorical effects.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticSpec:
    num_dense: int = 13
    num_sparse: int = 26
    vocab: int = 100
    signal_scale: float = 2.0
    # Planted second-order structure: the label also depends on dot products
    # of per-(slot,value) latent factors over this many random slot pairs —
    # the kind of signal CTR interaction ops (dot-product, FM) exist to model.
    interaction_pairs: int = 0
    interaction_scale: float = 1.0


def synthetic_arrays(
    n: int, spec: SyntheticSpec = SyntheticSpec(), seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(dense f32 [N,D], cat i32 [N,S], label f32 [N,1]).

    The planted model (w, cat_effects, latent factors) depends only on `spec`,
    so different seeds draw train/eval examples from the SAME ground-truth
    distribution.
    """
    model_rng = np.random.RandomState(1234)
    w = model_rng.randn(spec.num_dense).astype(np.float32) / np.sqrt(spec.num_dense)
    cat_effects = model_rng.randn(spec.num_sparse, spec.vocab).astype(np.float32) * 0.3
    rng = np.random.RandomState(seed)
    dense = rng.randn(n, spec.num_dense).astype(np.float32)
    cat = rng.randint(0, spec.vocab, size=(n, spec.num_sparse)).astype(np.int32)
    logits = spec.signal_scale * (
        dense @ w + cat_effects[np.arange(spec.num_sparse)[None, :], cat].sum(1)
    )
    if spec.interaction_pairs > 0:
        d_lat = 4
        z = model_rng.randn(spec.num_sparse, spec.vocab, d_lat).astype(np.float32)
        pairs = [
            tuple(model_rng.choice(spec.num_sparse, 2, replace=False))
            for _ in range(spec.interaction_pairs)
        ]
        inter = np.zeros(n, np.float32)
        for i, j in pairs:
            inter += np.einsum("nd,nd->n", z[i, cat[:, i]], z[j, cat[:, j]])
        logits = logits + spec.interaction_scale * inter / np.sqrt(
            spec.interaction_pairs
        )
    p = 1.0 / (1.0 + np.exp(-logits))
    y = (rng.random_sample(n) < p).astype(np.float32)[:, None]
    return dense, cat, y


def synthetic_batches(
    n: int,
    batch_size: int,
    spec: SyntheticSpec = SyntheticSpec(),
    seed: int = 0,
    loop: bool = False,
):
    dense, cat, y = synthetic_arrays(n, spec, seed)
    while True:
        for i in range(0, n - batch_size + 1, batch_size):
            yield dense[i : i + batch_size], cat[i : i + batch_size], y[i : i + batch_size]
        if not loop:
            return
