"""Optimizers and LR schedules with reference-parity semantics.

  - Adagrad with eps *added after sqrt* and zero initial accumulator, matching
    torch.optim.Adagrad as used by the reference
    (ref: nasrec/main_train.py:151-154: Adagrad(lr, eps=1e-2))
  - CosineAnnealingWarmupRestarts stepped per batch
    (ref: nasrec/utils/lr_schedule.py:47-165)
  - ConstantWithWarmup (ref: nasrec/utils/lr_schedule.py:21-42)
  - global-norm gradient clipping at 5.0 (ref: nasrec/utils/train_utils.py:284-285)
  - explicit L2 penalty over >=2-D params (ref: nasrec/utils/train_utils.py:91-115)

Implemented by hand (not optax.adagrad) because optax's scale_by_rss applies
eps inside the rsqrt, which changes early-training behavior at eps=1e-2.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


Pytree = Any


# ---------------------------------------------------------------------------
# Adagrad (torch parity)
# ---------------------------------------------------------------------------


def adagrad_init(params: Pytree) -> Pytree:
    """Zero sum-of-squares accumulator (torch initial_accumulator_value=0)."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def adagrad_update(
    params: Pytree, acc: Pytree, grads: Pytree, lr, eps: float = 1e-2
) -> Tuple[Pytree, Pytree]:
    """p -= lr * g / (sqrt(acc + g^2) + eps);  acc += g^2."""
    new_acc = jax.tree_util.tree_map(lambda a, g: a + jnp.square(g), acc, grads)
    new_params = jax.tree_util.tree_map(
        lambda p, a, g: p - lr * g / (jnp.sqrt(a) + eps), params, new_acc, grads
    )
    return new_params, new_acc


# ---------------------------------------------------------------------------
# SGD + Adam (reference optimizer lib parity, ref: main_train.py:151-160)
# ---------------------------------------------------------------------------


class SGDState(NamedTuple):
    momentum: Pytree


def sgd_init(params: Pytree) -> SGDState:
    return SGDState(jax.tree_util.tree_map(jnp.zeros_like, params))


def sgd_update(params, state: SGDState, grads, lr, momentum=0.9):
    """Nesterov SGD matching torch.optim.SGD(nesterov=True, momentum=0.9)."""
    new_m = jax.tree_util.tree_map(lambda m, g: momentum * m + g, state.momentum, grads)
    new_params = jax.tree_util.tree_map(
        lambda p, m, g: p - lr * (g + momentum * m), params, new_m, grads
    )
    return new_params, SGDState(new_m)


class AdamState(NamedTuple):
    mu: Pytree
    nu: Pytree
    count: jnp.ndarray


def adam_init(params: Pytree) -> AdamState:
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(z, jax.tree_util.tree_map(jnp.zeros_like, params), jnp.zeros((), jnp.int32))


def adam_update(params, state: AdamState, grads, lr, b1=0.9, b2=0.999, eps=1e-8):
    count = state.count + 1
    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(
        lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, grads
    )
    c = count.astype(jnp.float32)
    mhat_scale = 1.0 / (1 - b1**c)
    vhat_scale = 1.0 / (1 - b2**c)
    new_params = jax.tree_util.tree_map(
        lambda p, m, v: p - lr * (m * mhat_scale) / (jnp.sqrt(v * vhat_scale) + eps),
        params, mu, nu,
    )
    return new_params, AdamState(mu, nu, count)


@dataclasses.dataclass(frozen=True)
class Optimizer:
    """Minimal (init, update) optimizer pair; update(params, state, grads, lr)."""

    init: Callable[[Pytree], Any]
    update: Callable[..., Tuple[Pytree, Any]]


def make_optimizer(name: str) -> Optimizer:
    if name == "adagrad":
        return Optimizer(adagrad_init, adagrad_update)
    if name == "sgd":
        return Optimizer(sgd_init, sgd_update)
    if name == "adam":
        return Optimizer(adam_init, adam_update)
    raise NotImplementedError(f"optimizer {name}")


# ---------------------------------------------------------------------------
# Gradient clipping
# ---------------------------------------------------------------------------


def clip_by_global_norm(grads: Pytree, max_norm: float) -> Pytree:
    """torch.nn.utils.clip_grad_norm_ parity (scale iff norm > max)."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads)


# ---------------------------------------------------------------------------
# L2 penalty as an explicit loss term
# ---------------------------------------------------------------------------


def l2_penalty(params: Pytree, reg: float, exclude_path: Optional[str] = None):
    """reg * sum(||p||^2) over params with ndim >= 2 (biases and LN params are
    1-D and skipped, ref: train_utils.py:106-114).  `exclude_path` skips any
    param whose tree path starts with that string (e.g. "embedding")."""
    if reg == 0.0:
        return jnp.zeros((), jnp.float32)
    total = jnp.zeros((), jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        if leaf.ndim < 2:
            continue
        path_str = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        if exclude_path is not None and path_str.startswith(exclude_path):
            continue
        total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return reg * total


# ---------------------------------------------------------------------------
# LR schedules (functions of the 0-indexed batch step; jnp-friendly)
# ---------------------------------------------------------------------------


def cosine_warmup_restarts(
    step,
    first_cycle_steps: int,
    warmup_steps: int = 0,
    max_lr: float = 0.1,
    min_lr: float = 1e-8,
):
    """LR at batch `step` (stepped per batch, cycle_mult=1, gamma=1).

    Matches the reference scheduler state sequence: the LR used for batch t is
    get_lr() evaluated at step_in_cycle=t (ref: lr_schedule.py:97-131).
    """
    step = jnp.asarray(step)
    t = jnp.mod(step, first_cycle_steps)
    warm = min_lr + (max_lr - min_lr) * t / jnp.maximum(warmup_steps, 1)
    denom = jnp.maximum(first_cycle_steps - warmup_steps, 1)
    cos = min_lr + (max_lr - min_lr) * (
        1.0 + jnp.cos(jnp.pi * (t - warmup_steps) / denom)
    ) / 2.0
    return jnp.where(t < warmup_steps, warm, cos)


def constant_with_warmup(step, num_warmup_steps: int, base_lr: float):
    """Linear warmup to base_lr then constant (ref: lr_schedule.py:21-42;
    _step_count there is 1-based, so batch t uses scale (t+1)/warmup)."""
    step = jnp.asarray(step) + 1
    scale = jnp.minimum(step / jnp.maximum(num_warmup_steps, 1), 1.0)
    return base_lr * scale


def make_lr_schedule(
    name: str,
    base_lr: float,
    num_train_steps: int,
    num_warmup_steps: int,
) -> Callable:
    """Schedule factory mirroring the entry-point wiring
    (ref: main_train.py:162-180)."""
    if name == "cosine":
        return lambda step: cosine_warmup_restarts(
            step, num_train_steps, num_warmup_steps, max_lr=base_lr, min_lr=1e-8
        )
    if name == "constant":
        return lambda step: constant_with_warmup(step, num_warmup_steps, base_lr)
    if name == "constant-no-warmup":
        return lambda step: jnp.full((), base_lr)
    raise NotImplementedError(f"lr schedule {name}")
