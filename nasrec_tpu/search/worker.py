"""Weight-shared candidate evaluation — vectorized on-device.

Reference flow (ref: nasrec/eval_subnet_from_supernet.py:71-207): per
candidate, rebuild the supernet, pin the choice (fixed-path), freeze
everything but the final linear, load the trained supernet checkpoint, run a
short fine-tune (default 500 steps @ lr 0.04, Adagrad eps 1e-2, cosine
schedule with warmup steps//10, clip 5.0) and a 150-step eval; the reference
fans candidates out one-per-GPU with torch.multiprocessing
(ref: nasrec/searcher/searcher.py:126-156).

TPU-native design: a subnet choice is just a `ChoiceMasks` input, and in the
default final-only fine-tune mode the frozen supernet body is SHARED across
candidates, so K candidates evaluate as ONE vmapped program on one chip:
masks and per-candidate final-layer params carry a leading K axis while the
batch and the body weights are broadcast.  One compiled executable, K
candidates per data pass — replacing the process-per-GPU fan-out with
MXU-friendly batching.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.choices import Choice, ChoiceMasks, choice_to_masks
from nasrec_tpu.models import SuperNetConfig, supernet_apply
from nasrec_tpu.train.metrics import auc_exact, bce_with_logits, binary_accuracy, stable_sigmoid
from nasrec_tpu.train.optim import clip_by_global_norm, make_lr_schedule


def stack_masks(masks: Sequence[ChoiceMasks]) -> ChoiceMasks:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *masks)


def make_candidate_evaluator(
    cfg: SuperNetConfig,
    supernet_params: Dict,
    *,
    learning_rate: float = 0.04,
    max_train_steps: int = 500,
    max_eval_steps: int = 150,
    lr_schedule: str = "cosine",
    grad_clip: float = 5.0,
    adagrad_eps: float = 1e-2,
    eval_batch_chunk: int = 1024,
    finetune_mode: str = "final-only",  # final-only | whole | layernorm-calibrate
    batch_candidates: bool = True,
) -> Callable:
    """Build `evaluate(choices, train_iter_fn, test_iter_fn) -> [results]`.

    finetune_mode:
      "final-only" (the reference's default EA mode, set_mode_to_finelune_
      last_only): the body of `supernet_params` is frozen and shared, so K
      candidates advance in ONE vmapped step per batch (each owns only a
      copy of the final linear + its Adagrad accumulator).
      "whole" (--finetune_whole_supernet 1) and "layernorm-calibrate" train
      larger parameter sets; with batch_candidates (default) each candidate
      carries its own FULL param/accumulator copy and the K-way group still
      runs as one vmapped step (memory: K x |params| x 2 — fits the
      search-capped tables for the canonical group_size 8; pass
      batch_candidates=False to fall back to one-at-a-time).
    """
    if finetune_mode != "final-only":
        if batch_candidates:
            return _make_batched_whole_evaluator(
                cfg, supernet_params, finetune_mode,
                learning_rate=learning_rate, max_train_steps=max_train_steps,
                max_eval_steps=max_eval_steps, lr_schedule=lr_schedule,
                grad_clip=grad_clip, adagrad_eps=adagrad_eps,
                eval_batch_chunk=eval_batch_chunk,
            )
        return _make_sequential_evaluator(
            cfg, supernet_params, finetune_mode,
            learning_rate=learning_rate, max_train_steps=max_train_steps,
            max_eval_steps=max_eval_steps, lr_schedule=lr_schedule,
            grad_clip=grad_clip, eval_batch_chunk=eval_batch_chunk,
        )
    # The frozen body is threaded through jit as an ARGUMENT — capturing device
    # arrays as closure constants takes a slow per-call feed path on some PJRT
    # runtimes (and bloats the compiled program with the weights).
    body = {k: v for k, v in supernet_params.items() if k != "final"}
    final0 = supernet_params["final"]
    sched = make_lr_schedule(
        lr_schedule, learning_rate, max_train_steps, max_train_steps // 10
    )

    def one_candidate_loss(body_p, final, masks, dense, cat, y):
        params = dict(body_p)
        params["final"] = final
        logits = supernet_apply(cfg, params, dense, cat, masks)
        return bce_with_logits(logits, y)

    def one_candidate_step(body_p, final, acc, masks, dense, cat, y, lr):
        loss, g = jax.value_and_grad(one_candidate_loss, argnums=1)(
            body_p, final, masks, dense, cat, y
        )
        g = clip_by_global_norm(g, grad_clip)
        new_acc = jax.tree_util.tree_map(lambda a, gg: a + jnp.square(gg), acc, g)
        new_final = jax.tree_util.tree_map(
            lambda p, a, gg: p - lr * gg / (jnp.sqrt(a) + adagrad_eps),
            final, new_acc, g,
        )
        return new_final, new_acc, loss

    @jax.jit
    def multi_step(body_p, finals, accs, masks_k, step_idx, dense, cat, y):
        lr = sched(step_idx)
        return jax.vmap(
            one_candidate_step, in_axes=(None, 0, 0, 0, None, None, None, None)
        )(body_p, finals, accs, masks_k, dense, cat, y, lr)

    @jax.jit
    def multi_forward(body_p, finals, masks_k, dense, cat):
        def fwd(final, masks):
            params = dict(body_p)
            params["final"] = final
            return supernet_apply(cfg, params, dense, cat, masks)

        return jax.vmap(fwd, in_axes=(0, 0))(finals, masks_k)

    def evaluate(
        choices: Sequence[Choice],
        train_iter_fn: Callable[[], Iterable],
        test_iter_fn: Callable[[], Iterable],
        log_fn: Callable[[str], None] = lambda s: None,
    ) -> List[Dict]:
        k = len(choices)
        masks_k = stack_masks(
            [choice_to_masks(c, cfg.space, cfg.num_blocks) for c in choices]
        )
        finals = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape), final0
        )
        accs = jax.tree_util.tree_map(jnp.zeros_like, finals)

        # Fine-tune: one shared data stream, K candidates per step.
        step_idx = 0
        train_iter = iter(train_iter_fn())
        while step_idx < max_train_steps:
            try:
                dense, cat, y = next(train_iter)
            except StopIteration:
                train_iter = iter(train_iter_fn())
                continue
            finals, accs, losses = multi_step(
                body, finals, accs, masks_k, jnp.asarray(step_idx), dense, cat, y
            )
            step_idx += 1
            if step_idx % 100 == 0:
                log_fn(f"finetune step {step_idx}: loss {np.asarray(losses).mean():.5f}")

        # Eval: accumulate per-candidate logits over the shared test stream.
        # Large eval batches (ref: 8192) are chunked so the K-way vmapped
        # supernet forward stays within HBM.
        all_logits, all_labels = [], []
        for i, (dense, cat, y) in enumerate(test_iter_fn()):
            if max_eval_steps != -1 and i >= max_eval_steps:
                break
            chunks = []
            for s in range(0, len(y), eval_batch_chunk):
                sl = slice(s, s + eval_batch_chunk)
                chunks.append(
                    np.asarray(
                        multi_forward(body, finals, masks_k, dense[sl], cat[sl])
                    )[..., 0]
                )
            all_logits.append(np.concatenate(chunks, axis=1))
            all_labels.append(np.asarray(y).ravel())
        logits = np.concatenate(all_logits, axis=1)  # [K, N]
        labels = np.concatenate(all_labels)
        probs = stable_sigmoid(logits)
        eps = 1e-12

        results = []
        for i, choice in enumerate(choices):
            p = probs[i]
            logloss = float(
                -(labels * np.log(p + eps) + (1 - labels) * np.log(1 - p + eps)).mean()
            )
            if not np.isfinite(logloss):
                # Divergence sentinel (ref: train_utils.py:294-301)
                results.append(
                    {"choice": choice, "test_acc": -1, "test_auroc": -1,
                     "test_loss": 999.99}
                )
                continue
            results.append(
                {
                    "choice": choice,
                    "test_acc": binary_accuracy(p, labels),
                    "test_auroc": auc_exact(labels, p),
                    "test_loss": logloss,
                }
            )
        return results

    return evaluate


def _make_batched_whole_evaluator(
    cfg: SuperNetConfig,
    supernet_params: Dict,
    finetune_mode: str,
    *,
    learning_rate: float,
    max_train_steps: int,
    max_eval_steps: int,
    lr_schedule: str,
    grad_clip: float,
    adagrad_eps: float,
    eval_batch_chunk: int,
) -> Callable:
    """Whole-net / LN-calibrate fine-tune with K candidates per step: every
    candidate owns a full (params, adagrad acc) copy, stacked on a leading K
    axis, and the group advances as ONE vmapped jitted step (closing the ~Kx
    throughput gap of the sequential path; ref --finetune_whole_supernet,
    eval_subnet_from_supernet.py:116-122)."""
    from nasrec_tpu.train.loop import freeze_mask_bools

    mode = {"whole": "normal", "layernorm-calibrate": "layernorm-calibrate"}[
        finetune_mode
    ]
    sched = make_lr_schedule(
        lr_schedule, learning_rate, max_train_steps, max_train_steps // 10
    )
    # Static python-bool tree: baked into the jit at trace time.  An ARRAY
    # mask tree here would be a device-array closure constant (re-fed per
    # call on the axon runtime — and it includes a table-sized leaf).
    trainable = (
        None if mode == "normal" else freeze_mask_bools(supernet_params, mode)
    )

    def one_loss(params, masks, dense, cat, y):
        return bce_with_logits(supernet_apply(cfg, params, dense, cat, masks), y)

    def one_step(params, acc, masks, dense, cat, y, lr):
        loss, g = jax.value_and_grad(one_loss)(params, masks, dense, cat, y)
        if trainable is not None:
            g = jax.tree_util.tree_map(
                lambda gg, keep: gg if keep else jnp.zeros_like(gg),
                g, trainable,
            )
        g = clip_by_global_norm(g, grad_clip)
        new_acc = jax.tree_util.tree_map(lambda a, gg: a + jnp.square(gg), acc, g)
        new_params = jax.tree_util.tree_map(
            lambda p, a, gg: p - lr * gg / (jnp.sqrt(a) + adagrad_eps),
            params, new_acc, g,
        )
        return new_params, new_acc, loss

    @jax.jit
    def multi_step(params_k, accs_k, masks_k, step_idx, dense, cat, y):
        lr = sched(step_idx)
        return jax.vmap(
            one_step, in_axes=(0, 0, 0, None, None, None, None)
        )(params_k, accs_k, masks_k, dense, cat, y, lr)

    @jax.jit
    def multi_forward(params_k, masks_k, dense, cat):
        return jax.vmap(
            lambda p, m: supernet_apply(cfg, p, dense, cat, m), in_axes=(0, 0)
        )(params_k, masks_k)

    def evaluate(choices, train_iter_fn, test_iter_fn, log_fn=lambda s: None):
        k = len(choices)
        masks_k = stack_masks(
            [choice_to_masks(c, cfg.space, cfg.num_blocks) for c in choices]
        )
        params_k = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape), supernet_params
        )
        accs_k = jax.tree_util.tree_map(jnp.zeros_like, params_k)

        step_idx = 0
        train_iter = iter(train_iter_fn())
        while step_idx < max_train_steps:
            try:
                dense, cat, y = next(train_iter)
            except StopIteration:
                train_iter = iter(train_iter_fn())
                continue
            params_k, accs_k, losses = multi_step(
                params_k, accs_k, masks_k, jnp.asarray(step_idx), dense, cat, y
            )
            step_idx += 1
            if step_idx % 100 == 0:
                log_fn(f"finetune step {step_idx}: loss {np.asarray(losses).mean():.5f}")

        all_logits, all_labels = [], []
        for i, (dense, cat, y) in enumerate(test_iter_fn()):
            if max_eval_steps != -1 and i >= max_eval_steps:
                break
            chunks = []
            for s in range(0, len(y), eval_batch_chunk):
                sl = slice(s, s + eval_batch_chunk)
                chunks.append(
                    np.asarray(
                        multi_forward(params_k, masks_k, dense[sl], cat[sl])
                    )[..., 0]
                )
            all_logits.append(np.concatenate(chunks, axis=1))
            all_labels.append(np.asarray(y).ravel())
        logits = np.concatenate(all_logits, axis=1)
        labels = np.concatenate(all_labels)
        probs = stable_sigmoid(logits)
        eps = 1e-12
        results = []
        for i, choice in enumerate(choices):
            p = probs[i]
            logloss = float(
                -(labels * np.log(p + eps) + (1 - labels) * np.log(1 - p + eps)).mean()
            )
            if not np.isfinite(logloss):
                results.append({"choice": choice, "test_acc": -1,
                                "test_auroc": -1, "test_loss": 999.99})
            else:
                results.append({
                    "choice": choice,
                    "test_acc": binary_accuracy(p, labels),
                    "test_auroc": auc_exact(labels, p),
                    "test_loss": logloss,
                })
        return results

    return evaluate


def _make_sequential_evaluator(
    cfg: SuperNetConfig,
    supernet_params: Dict,
    finetune_mode: str,
    *,
    learning_rate: float,
    max_train_steps: int,
    max_eval_steps: int,
    lr_schedule: str,
    grad_clip: float,
    eval_batch_chunk: int,
) -> Callable:
    """Whole-net / LN-calibrate fine-tune: one candidate at a time, standard
    masked train step, params re-loaded from the supernet checkpoint per
    candidate (ref: eval_subnet_from_supernet.py:116-122, :169-176)."""
    from nasrec_tpu.train.loop import (
        evaluate_one_epoch,
        freeze_mask,
        init_train_state,
        make_eval_step,
        make_train_step,
    )
    from nasrec_tpu.train.optim import make_lr_schedule, make_optimizer

    mode = {"whole": "normal", "layernorm-calibrate": "layernorm-calibrate"}[
        finetune_mode
    ]
    opt = make_optimizer("adagrad")
    sched = make_lr_schedule(
        lr_schedule, learning_rate, max_train_steps, max_train_steps // 10
    )
    trainable = None if mode == "normal" else freeze_mask(supernet_params, mode)
    step = make_train_step(
        lambda p, d, c, m: supernet_apply(cfg, p, d, c, m),
        opt, sched, grad_clip=grad_clip, has_masks=True,
        trainable=trainable, donate=False,
    )
    eval_step = make_eval_step(
        lambda p, d, c, m: supernet_apply(cfg, p, d, c, m), has_masks=True
    )

    def evaluate(choices, train_iter_fn, test_iter_fn, log_fn=lambda s: None):
        results = []
        for ci, choice in enumerate(choices):
            masks = choice_to_masks(choice, cfg.space, cfg.num_blocks)
            state = init_train_state(supernet_params, opt)
            step_idx = 0
            train_iter = iter(train_iter_fn())
            while step_idx < max_train_steps:
                try:
                    dense, cat, y = next(train_iter)
                except StopIteration:
                    train_iter = iter(train_iter_fn())
                    continue
                state, metrics = step(state, dense, cat, y, masks)
                step_idx += 1
            acc, auroc, logloss = evaluate_one_epoch(
                eval_step, state.params, test_iter_fn(),
                masks=masks, max_steps=max_eval_steps,
            )
            if not np.isfinite(logloss):
                results.append({"choice": choice, "test_acc": -1,
                                "test_auroc": -1, "test_loss": 999.99})
            else:
                results.append({"choice": choice, "test_acc": acc,
                                "test_auroc": auroc, "test_loss": logloss})
            log_fn(f"candidate {ci + 1}/{len(choices)}: loss {results[-1]['test_loss']:.5f}")
        return results

    return evaluate


def finetune_and_eval_candidates(
    cfg: SuperNetConfig,
    supernet_params: Dict,
    choices: Sequence[Choice],
    train_iter_fn,
    test_iter_fn,
    **kwargs,
) -> List[Dict]:
    """Convenience wrapper: build an evaluator and run it once."""
    evaluator = make_candidate_evaluator(cfg, supernet_params, **kwargs)
    return evaluator(choices, train_iter_fn, test_iter_fn)
