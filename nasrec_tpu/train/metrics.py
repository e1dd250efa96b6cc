"""Losses and metrics: BCE-with-logits, accuracy, exact AUROC.

AUROC is computed on the host over the full eval split (exact Mann-Whitney
with tie handling, equivalent to sklearn.metrics.roc_auc_score) — the eval
split fits trivially in host RAM (<40 MB for Criteo).  The reference used
sklearn (ref: nasrec/utils/train_utils.py:169-172).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def stable_sigmoid(x: np.ndarray) -> np.ndarray:
    """Overflow-free sigmoid on the host."""
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss parity):
    max(x,0) - x*y + log(1 + exp(-|x|))."""
    x = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    per = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per)


def binary_accuracy(probs: np.ndarray, labels: np.ndarray) -> float:
    """Accuracy at threshold 0.5 (ref: train_utils.py:118-126)."""
    pred = (probs > 0.5).astype(np.float32)
    return float((pred == labels).mean())


def auc_exact(labels: np.ndarray, scores: np.ndarray) -> float:
    """Exact AUROC via average ranks (ties handled like sklearn)."""
    labels = np.asarray(labels).ravel().astype(np.float64)
    scores = np.asarray(scores).ravel().astype(np.float64)
    n_pos = labels.sum()
    n_neg = labels.shape[0] - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    sorted_scores = scores[order]
    ranks = np.empty_like(sorted_scores)
    # average ranks over tied groups
    i = 0
    n = len(sorted_scores)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[i : j + 1] = 0.5 * (i + j) + 1.0  # 1-based average rank
        i = j + 1
    pos_rank_sum = ranks[labels[order] == 1].sum()
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
