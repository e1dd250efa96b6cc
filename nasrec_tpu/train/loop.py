"""The training/eval loops shared by all four workloads.

TPU-native re-design of the reference hot loop
(ref: nasrec/utils/train_utils.py:181-390):
  - the whole optimizer step (fwd + loss + L2 + bwd + global-norm clip +
    adagrad + LR schedule) is ONE jitted function with donated buffers;
  - the LR schedule is computed on device from the step counter;
  - subnet sampling stays on the host: the sampled choice is lowered to
    `ChoiceMasks` and fed as an input, so supernet training never recompiles;
  - metrics are fetched only on display/test boundaries (async dispatch keeps
    the device busy while the host prepares the next batch);
  - NaN divergence guard returns the reference's sentinel logs
    (loss 999.99 / AUROC -1, ref: train_utils.py:294-301).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.train.metrics import auc_exact, bce_with_logits, binary_accuracy, stable_sigmoid
from nasrec_tpu.train.optim import (
    Optimizer,
    clip_by_global_norm,
    l2_penalty,
)


def _fetch(x):
    """Host numpy fetch that survives multi-process global arrays (gathers
    across processes so metrics equal the single-process run; collective —
    every process must reach the same fetches in the same order)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from nasrec_tpu.parallel.distributed import fetch_array

        return fetch_array(x)
    return np.asarray(x)


def _fetch_params(params):
    """device_get of a param pytree, gathering multi-process shards."""
    leaves = jax.tree_util.tree_leaves(params)
    if any(isinstance(l, jax.Array) and not l.is_fully_addressable
           for l in leaves):
        from nasrec_tpu.parallel.distributed import fetch_pytree

        return fetch_pytree(params)
    return jax.device_get(params)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def init_train_state(params, optimizer: Optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def freeze_mask_bools(params, mode: str):
    """Python-bool pytree selecting trainable params (True = trainable).

    Being plain bools, the tree is safe to bake into a jitted step as a
    static closure (a device-array mask tree would be re-fed per call on
    remote runtimes — the CLAUDE.md closure rule).

    Modes mirror the reference's fine-tune switches
    (ref: nasrec/supernet/supernet.py:850-873):
      normal               everything trainable
      final-only           only the final linear ("finetune last only")
      no-embedding         everything but the embedding table
      layernorm-calibrate  only LN scales/biases inside blocks
    """

    def path_keys(path):
        return [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]

    def decide(path, leaf):
        keys = path_keys(path)
        if mode == "normal":
            return True
        if mode == "final-only":
            return keys[0] == "final"
        if mode == "no-embedding":
            return keys[0] != "embedding"
        if mode == "layernorm-calibrate":
            # Structural: a LayerNorm param is any leaf held by a dict whose
            # key is "ln" or ends in "_ln" (ops/common.ln_init callers); the
            # exact trainable leaf set is pinned by
            # tests/test_train.py::test_freeze_mask_layernorm_calibrate_leaf_set.
            return keys[0] == "blocks" and any(
                k == "ln" or k.endswith("_ln") for k in keys[:-1]
            )
        raise ValueError(f"unknown freeze mode {mode}")

    return jax.tree_util.tree_map_with_path(decide, params)


def freeze_mask(params, mode: str):
    """0/1 array pytree selecting trainable params (see freeze_mask_bools)."""
    return jax.tree_util.tree_map(
        lambda keep, leaf: jnp.ones_like(leaf) if keep else jnp.zeros_like(leaf),
        freeze_mask_bools(params, mode), params,
    )


def make_train_step(
    apply_fn: Callable,            # (params, dense, cat[, masks]) -> logits
    optimizer: Optimizer,
    lr_schedule: Callable,         # step -> lr
    *,
    l2_reg: float = 0.0,
    l2_exclude: Optional[str] = None,
    grad_clip: Optional[float] = 5.0,
    has_masks: bool = False,
    trainable: Optional[Any] = None,  # 0/1 pytree from freeze_mask
    donate: bool = True,
):
    """Build the jitted optimizer step: state, batch[, masks] -> state, metrics."""

    def step_fn(state: TrainState, dense, cat, y, masks=None):
        if isinstance(masks, tuple):  # (device mask buffer, index) — select on device
            buffer, idx = masks
            masks = jax.tree_util.tree_map(lambda x: x[idx], buffer)

        def loss_fn(params):
            logits = (
                apply_fn(params, dense, cat, masks)
                if has_masks
                else apply_fn(params, dense, cat)
            )
            bce = bce_with_logits(logits, y)
            l2 = l2_penalty(params, l2_reg, l2_exclude)
            return bce + l2, (bce, l2, logits)

        (_, (bce, l2, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if trainable is not None:
            grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, trainable)
        if grad_clip is not None:
            grads = clip_by_global_norm(grads, grad_clip)
        lr = lr_schedule(state.step)
        new_params, new_opt = optimizer.update(state.params, state.opt_state, grads, lr)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        metrics = {"loss": bce, "l2": l2, "lr": lr, "logits": logits}
        return new_state, metrics

    if has_masks:
        fn = lambda state, dense, cat, y, masks: step_fn(state, dense, cat, y, masks)
        return jax.jit(fn, donate_argnums=(0,) if donate else ())
    fn = lambda state, dense, cat, y: step_fn(state, dense, cat, y)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, has_masks: bool = False):
    if has_masks:
        return jax.jit(lambda params, dense, cat, masks: apply_fn(params, dense, cat, masks))
    return jax.jit(lambda params, dense, cat: apply_fn(params, dense, cat))


def evaluate_one_epoch(
    eval_step,
    params,
    test_iter: Iterable,
    *,
    masks=None,
    max_steps: int = -1,
    verbose: bool = False,
) -> Tuple[float, float, float]:
    """Full-split eval -> (accuracy, auroc, logloss).

    Ref: nasrec/utils/train_utils.py:129-178 (sigmoid probs, sklearn AUROC,
    BCE over the concatenated split).
    """
    all_logits, all_labels = [], []
    for i, (dense, cat, y) in enumerate(test_iter):
        if max_steps != -1 and i >= max_steps:
            break
        m = masks() if callable(masks) else masks  # callable = sample per batch
        logits = (
            eval_step(params, dense, cat, m)
            if m is not None
            else eval_step(params, dense, cat)
        )
        all_logits.append(_fetch(logits).ravel())
        all_labels.append(_fetch(y).ravel())
        if verbose and (i + 1) % 50 == 0:
            print(f"eval: {i + 1} batches")
    if not all_logits:
        raise ValueError(
            "eval iterator produced no batches — is test_batch_size larger "
            "than the eval split (batches are dropped when short)?"
        )
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    probs = stable_sigmoid(logits)
    # Mean BCE over all examples (the reference computes it over the
    # concatenated tensor, i.e. example-weighted, ref :174-177).
    eps = 1e-12
    logloss = float(
        -(labels * np.log(probs + eps) + (1 - labels) * np.log(1 - probs + eps)).mean()
    )
    acc = binary_accuracy(probs, labels)
    auroc = auc_exact(labels, probs)
    return acc, auroc, logloss


def train_and_test_one_epoch(
    train_step,
    eval_step,
    state: TrainState,
    train_iter: Iterable,
    make_test_iter: Callable[[], Iterable],
    *,
    epoch: int = 0,
    sampler: Optional[Callable] = None,   # () -> ChoiceMasks (supernet mode)
    eval_masks=None,                       # masks used at eval time
    display_interval: int = 100,
    test_interval: int = 2000,
    max_train_steps: int = -1,
    max_eval_steps: int = -1,
    test_only_at_last_step: bool = False,
    keep_best: bool = True,
    log_fn: Callable[[str], None] = print,
    metrics_writer=None,  # optional train.logging.MetricsWriter
) -> Tuple[TrainState, Dict[str, list], Optional[Any]]:
    """One epoch of interleaved train/eval.  Returns (state, logs, best_params).

    Ref: nasrec/utils/train_utils.py:181-390.
    """
    logs: Dict[str, list] = {
        "train_loss": [], "train_AUROC": [], "train_Accuracy": [],
        "test_loss": [], "test_AUROC": [], "test_Accuracy": [],
        "epoch": [], "iters": [],
    }
    best_params = None
    best_test_loss = float("inf")
    t_start = time.time()
    examples = 0
    batch_num = -1

    for batch_num, (dense, cat, y) in enumerate(train_iter):
        if sampler is not None:
            state, metrics = train_step(state, dense, cat, y, sampler())
        else:
            state, metrics = train_step(state, dense, cat, y)
        examples += len(y)

        is_last = batch_num == max_train_steps - 1
        if batch_num % display_interval == 0 or is_last:
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                log_fn("Loss NaN. Exiting...")
                logs["test_loss"].append(999.99)
                logs["test_AUROC"].append(-1)
                logs["test_Accuracy"].append(-1)
                return state, logs, best_params
            logits = _fetch(metrics["logits"]).ravel()
            labels = _fetch(y).ravel()
            probs = stable_sigmoid(logits)
            try:
                train_auroc = auc_exact(labels, probs)
            except Exception:
                train_auroc = 1.0
            train_acc = binary_accuracy(probs, labels)
            dt = time.time() - t_start
            log_fn(
                f"epoch {epoch} step {batch_num} loss {loss:.6f} "
                f"l2 {float(metrics['l2']):.6f} lr {float(metrics['lr']):.6f} "
                f"acc {train_acc:.4f} auroc {train_auroc:.4f} "
                f"({examples / max(dt, 1e-9):.0f} ex/s)"
            )
            logs["train_loss"].append(loss)
            logs["train_AUROC"].append(train_auroc)
            logs["train_Accuracy"].append(train_acc)
            logs["epoch"].append(epoch)
            logs["iters"].append(batch_num)
            if metrics_writer is not None:
                # Tag scheme mirrors the reference (train_utils.py:334-338).
                metrics_writer.scalar(f"Loss/train/epoch{epoch}", loss, batch_num)
                metrics_writer.scalar(f"Acc/train/epoch{epoch}", train_acc, batch_num)
                metrics_writer.scalar(f"AUROC/train/epoch{epoch}", train_auroc, batch_num)
                metrics_writer.scalar(f"lr/epoch{epoch}", float(metrics["lr"]), batch_num)

        if batch_num % test_interval == 0 or is_last:
            if (not test_only_at_last_step) or is_last:
                t0 = time.time()
                acc, auroc, tloss = evaluate_one_epoch(
                    eval_step, state.params, make_test_iter(),
                    masks=eval_masks, max_steps=max_eval_steps,
                )
                log_fn(
                    f"TEST acc {acc:.4f} auroc {auroc:.4f} loss {tloss:.6f} "
                    f"({time.time() - t0:.1f}s)"
                )
                logs["test_loss"].append(tloss)
                logs["test_AUROC"].append(auroc)
                logs["test_Accuracy"].append(acc)
                if metrics_writer is not None:
                    metrics_writer.scalar(f"Loss/test/epoch{epoch}", tloss, batch_num)
                    metrics_writer.scalar(f"Acc/test/epoch{epoch}", acc, batch_num)
                    metrics_writer.scalar(f"AUROC/test/epoch{epoch}", auroc, batch_num)
                if keep_best and tloss < best_test_loss:
                    best_test_loss = tloss
                    best_params = _fetch_params(state.params)

        if max_train_steps != -1 and batch_num >= max_train_steps - 1:
            return state, logs, best_params

    log_fn(f"Batch counter total: {batch_num}")
    return state, logs, best_params
