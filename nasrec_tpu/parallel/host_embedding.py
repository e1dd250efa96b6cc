"""Host-offloaded embedding training (place_embedding_on_cpu parity).

The reference can keep embedding tables on CPU to fit huge vocabularies
(ref: nasrec/supernet/supernet.py:253-254, :826-840, "expect 10~100x
slow down").  TPU-native version: the fused table and its Adagrad
accumulator live in host RAM; the device step takes the looked-up stem
[B, S, E] as an *input* and returns the loss gradient w.r.t. it; the host
then scatter-adds the sparse update into the table.  Only 2*B*S*E floats
cross PCIe per step — the table itself never moves.

Gradient-clip exactness: torch's global-norm clip sees the *scatter-added*
per-row embedding gradients.  The host computes that norm (duplicates summed
before squaring) and returns it to scale both the device-side update and the
host-side scatter, so offloaded training matches on-device training bit-for-
near (see tests/test_host_embedding.py).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.train.loop import TrainState
from nasrec_tpu.train.metrics import bce_with_logits
from nasrec_tpu.train.optim import Optimizer, l2_penalty


class HostEmbedding:
    """Fused embedding table + Adagrad accumulator in host RAM."""

    def __init__(self, table: np.ndarray, offsets: np.ndarray, eps: float = 1e-2):
        self.table = np.asarray(table, np.float32).copy()
        self.acc = np.zeros_like(self.table)
        self.offsets = np.asarray(offsets, np.int32)
        self.eps = eps

    def lookup(self, cat_x: np.ndarray) -> np.ndarray:
        idx = np.asarray(cat_x) + self.offsets[None, :]
        return self.table[idx]  # [B, S, E]

    def grad_rows(self, cat_x: np.ndarray, stem_grad: np.ndarray):
        """Scatter-add the stem gradient into unique rows.
        Returns (unique_rows, row_grads, sq_norm)."""
        idx = (np.asarray(cat_x) + self.offsets[None, :]).ravel()
        g = np.asarray(stem_grad, np.float32).reshape(-1, self.table.shape[1])
        rows, inv = np.unique(idx, return_inverse=True)
        dense_g = np.zeros((len(rows), g.shape[1]), np.float32)
        np.add.at(dense_g, inv, g)
        return rows, dense_g, float(np.sum(dense_g.astype(np.float64) ** 2))

    def apply_grad(self, rows: np.ndarray, row_grads: np.ndarray, lr: float,
                   scale: float = 1.0) -> None:
        g = row_grads * scale
        self.acc[rows] += g * g
        self.table[rows] -= lr * g / (np.sqrt(self.acc[rows]) + self.eps)


def make_host_offload_train_step(
    apply_embedded: Callable,   # (params_no_emb, dense, stem[, masks]) -> logits
    optimizer: Optimizer,
    lr_schedule: Callable,
    host_emb: HostEmbedding,
    *,
    grad_clip: float | None = 5.0,
    l2_reg: float = 0.0,
    l2_exclude: str | None = None,
    has_masks: bool = False,
):
    """Returns step(state, dense, cat, y[, masks]) advancing both device params
    and the host table.  `apply_embedded(params, dense, stem)` must treat
    `stem` as the [B,S,E] embedding output (models' apply with a precomputed
    stem).  L2 is an explicit loss term over the device-resident params, the
    same set the on-device sparse step regularises (the table is excluded
    there too); the host table update itself is hard-coded Adagrad, so
    callers must reject other optimizers rather than silently diverge."""

    @jax.jit
    def device_grads(params, dense, stem, y, masks=None):
        def loss_fn(p, s):
            logits = (
                apply_embedded(p, dense, s, masks)
                if has_masks
                else apply_embedded(p, dense, s)
            )
            bce = bce_with_logits(logits, y)
            return bce + l2_penalty(p, l2_reg, l2_exclude), (bce, logits)

        (loss, (bce, logits)), (gp, gs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, stem)
        sq = sum(
            jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree_util.tree_leaves(gp)
        )
        return loss, bce, logits, gp, gs, sq

    @jax.jit
    def device_update(params, opt_state, grads, scale, lr):
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        return optimizer.update(params, opt_state, grads, lr)

    def step(state: TrainState, dense, cat, y, masks=None):
        cat = np.asarray(cat)
        stem = jnp.asarray(host_emb.lookup(cat))
        loss, bce, logits, gp, gs, sq_dense = device_grads(
            state.params, dense, stem, y, masks
        )
        rows, row_grads, sq_emb = host_emb.grad_rows(cat, jax.device_get(gs))
        if grad_clip is not None:
            total_norm = float(np.sqrt(float(sq_dense) + sq_emb))
            scale = min(1.0, grad_clip / (total_norm + 1e-6))
        else:
            scale = 1.0
        lr = float(lr_schedule(state.step))
        new_params, new_opt = device_update(
            state.params, state.opt_state, gp, jnp.float32(scale), jnp.float32(lr)
        )
        host_emb.apply_grad(rows, row_grads, lr, scale)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            {"loss": bce, "l2": loss - bce, "lr": lr, "logits": logits},
        )

    return step
