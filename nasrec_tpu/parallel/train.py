"""Sharded training: param/batch shardings and the pjit'ed optimizer step.

Sharding layout (SURVEY.md §2.9 TPU-native plan):
  - embedding table : P("model", None)   row-sharded vocab
  - all other params: replicated          (dense tower is <= a few MFLOPs/ex)
  - batch           : P("data", ...)      data parallel
XLA inserts the gradient all-reduce over `data`; the embedding lookup and its
scatter-add gradient stay shard-local except one psum over `model`
(see nasrec_tpu/parallel/embedding.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nasrec_tpu.train.loop import TrainState
from nasrec_tpu.train.metrics import bce_with_logits
from nasrec_tpu.train.optim import Optimizer, clip_by_global_norm, l2_penalty


def _is_table(path) -> bool:
    keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
    return "embedding" in keys and keys[-1] == "table"


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree: table row-sharded over `model`, rest replicated."""
    def decide(path, leaf):
        if _is_table(path):
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(decide, params)


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place an existing host/single-device state onto the mesh."""
    ps = param_shardings(state.params, mesh)
    os_ = param_shardings(state.opt_state, mesh)
    return TrainState(
        params=jax.device_put(state.params, ps),
        opt_state=jax.device_put(state.opt_state, os_),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )


def make_parallel_train_step(
    apply_fn: Callable,            # (params, dense, cat[, masks]) -> logits
    optimizer: Optimizer,
    lr_schedule: Callable,
    mesh: Mesh,
    *,
    l2_reg: float = 0.0,
    l2_exclude: Optional[str] = None,
    grad_clip: Optional[float] = 5.0,
    has_masks: bool = False,
    donate: bool = True,
):
    """jit'ed step with explicit in/out shardings over (data, model).

    `apply_fn` must already use the sharded stem lookup
    (parallel/embedding.make_sharded_stem_lookup(mesh)) so the table access
    stays shard-local.
    """
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step_fn(state: TrainState, dense, cat, y, masks=None):
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
        if grad_clip is not None:
            grads = clip_by_global_norm(grads, grad_clip)
        lr = lr_schedule(state.step)
        new_params, new_opt = optimizer.update(state.params, state.opt_state, grads, lr)
        metrics = {"loss": bce, "l2": l2, "lr": lr, "logits": logits}
        return TrainState(new_params, new_opt, state.step + 1), metrics

    if has_masks:
        fn = lambda state, dense, cat, y, masks: step_fn(state, dense, cat, y, masks)
        in_shardings = (None, batch_sharding, batch_sharding, batch_sharding, repl)
    else:
        fn = lambda state, dense, cat, y: step_fn(state, dense, cat, y)
        in_shardings = (None, batch_sharding, batch_sharding, batch_sharding)

    return jax.jit(
        fn,
        in_shardings=in_shardings,
        donate_argnums=(0,) if donate else (),
    )
