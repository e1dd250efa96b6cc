"""Profiling utilities: latency, FLOPs, parameter counts.

Parity targets: get_model_latency's warmup + 5-95 percentile trim
(ref: nasrec/utils/train_utils.py:455-499) and fvcore FLOPs counting
(ref: train_utils.py:436-452) — here FLOPs come from XLA's own cost analysis
of the lowered HLO, which (unlike fvcore) includes batched matmuls.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import numpy as np
import jax


def count_params(params: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


def count_flops(fn: Callable, *args) -> float:
    """FLOPs of one call of jit(fn)(*args) from XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def cost_analysis_of(jitted_fn, *args) -> dict:
    """{"flops": N, "bytes_accessed": N} for one call of an already-jitted
    function (XLA's own cost model of the compiled executable).  Values are
    0.0 when the backend does not report them."""
    cost = jitted_fn.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", 0.0) or 0.0),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0) or 0.0),
    }


def measure_latency(
    fn: Callable,
    args: Tuple,
    num_warmup_steps: int = 10,
    num_trials: int = 200,
) -> Tuple[float, float]:
    """(mean, std) wall-clock seconds per call, 5-95 percentile trimmed."""
    jfn = jax.jit(fn)
    lat = []
    for i in range(num_warmup_steps + num_trials):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        if i >= num_warmup_steps:
            lat.append(t1 - t0)
    lat = np.asarray(lat)
    lo, hi = np.percentile(lat, 5), np.percentile(lat, 95)
    lat = lat[(lat >= lo) & (lat <= hi)]
    return float(lat.mean()), float(lat.std())
