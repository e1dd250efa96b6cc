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


def dot_flops(fn: Callable, *args, **kwargs) -> int:
    """Matmul/conv FLOPs of one call of fn(*args) counted from the jaxpr
    (2*M*N*K per dot_general, batch dims included), recursing into
    pjit/scan/cond/custom-vjp/pallas sub-jaxprs.

    Unlike XLA's aggregate ``cost_analysis()['flops']`` — which also counts
    sorts, scans, scatters and element-wise ops and can overstate the
    MXU-relevant FLOPs several-fold — this is exactly the arithmetic that
    lands on the systolic array, so achieved/peak ratios computed from it
    are meaningful (ref fvcore counting: nasrec/utils/train_utils.py:436-452).
    """
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _dot_flops_of_jaxpr(jaxpr.jaxpr)


def _dot_flops_of_jaxpr(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            a, b = eqn.invars[0].aval, eqn.invars[1].aval
            m = int(np.prod([a.shape[i] for i in range(a.ndim)
                             if i not in lc and i not in lb], dtype=np.int64))
            k = int(np.prod([a.shape[i] for i in lc], dtype=np.int64))
            n = int(np.prod([b.shape[i] for i in range(b.ndim)
                             if i not in rc and i not in rb], dtype=np.int64))
            batch = int(np.prod([a.shape[i] for i in lb], dtype=np.int64))
            total += 2 * m * n * k * batch
        elif prim == "conv_general_dilated":
            out = eqn.outvars[0].aval
            rhs = eqn.invars[1].aval
            total += 2 * int(np.prod(out.shape)) * int(np.prod(rhs.shape[1:]))
        # Recurse into sub-jaxprs (pjit, scan, while, pallas_call,
        # custom_vjp).  A scan body runs `length` times per call — without
        # the multiplier, micro-batched (grad-accumulation) steps would
        # under-report their MXU work by that factor.
        mult = eqn.params.get("length", 1) if prim == "scan" else 1
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                total += mult * _dot_flops_of_jaxpr(sub.jaxpr)
            elif hasattr(sub, "eqns"):
                total += mult * _dot_flops_of_jaxpr(sub)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        total += mult * _dot_flops_of_jaxpr(s.jaxpr)
                    elif hasattr(s, "eqns"):
                        total += mult * _dot_flops_of_jaxpr(s)
    return total


def _tensor_bytes_of_jaxpr(jaxpr) -> int:
    total = 0
    for v in jaxpr.invars:
        aval = v.aval
        if hasattr(aval, "shape"):
            total += int(np.prod(aval.shape, dtype=np.int64)) * aval.dtype.itemsize
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            aval = v.aval
            if hasattr(aval, "shape") and hasattr(aval, "dtype"):
                total += (
                    int(np.prod(aval.shape, dtype=np.int64)) * aval.dtype.itemsize
                )
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                total += _tensor_bytes_of_jaxpr(sub.jaxpr)
            elif hasattr(sub, "eqns"):
                total += _tensor_bytes_of_jaxpr(sub)
    return total


def tensor_bytes(fn: Callable, *args) -> int:
    """Bytes of every tensor the traced fn touches: inputs once + each
    intermediate once (jaxpr outvars, recursing into pjit sub-jaxprs).
    Over-counts XLA-fused elementwise chains and under-counts re-reads, so
    it is a candidate-RANKING proxy, not a bandwidth measurement."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _tensor_bytes_of_jaxpr(jaxpr.jaxpr)


def estimate_latency_cost_model(fn: Callable, args: Tuple, calib: dict) -> float:
    """Compile-free analytic forward-latency estimate in seconds:

        dot_flops / measured_matmul_peak + tensor_bytes / measured_copy_bw

    Both terms come from ONE trace (jax.make_jaxpr — no XLA compile), so
    scoring N search candidates costs zero compilations; `calib` is a
    one-time calibrate_chip() result.  The estimate is an arithmetic +
    bandwidth LOWER BOUND that is CONSISTENT across candidates — exactly
    what the TuNAS-style penalty (latency/target - 1) needs for ranking
    (ref: nasrec/searcher/searcher.py:65-73, searcher_utils.py:77-103 —
    the reference measures wall latency per candidate, affordable on its
    runtime; on this runtime each distinct subnet's first compile is
    30-250 s, which a 240-generation EA cannot pay per candidate)."""
    flops = dot_flops(fn, *args)
    nbytes = tensor_bytes(fn, *args)
    return (
        flops / calib["matmul_flops_per_s"]
        + nbytes / calib["copy_bytes_per_s"]
    )


def calibrate_chip(matmul_dim: int = 4096, copy_mb: int = 512,
                   trials: int = 20) -> dict:
    """Measured achievable peaks of THIS chip: dense bf16 matmul FLOP/s and
    HBM copy bandwidth (read+write bytes).  Public spec sheets are not
    reliable denominators behind virtualized runtimes, so bench rooflines
    report fractions of these *measured* peaks alongside the spec numbers."""
    import jax.numpy as jnp

    n = matmul_dim
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    # full(1/n) is a fixed point of a@a up to rounding: chained calls never
    # overflow bf16, so every link does real arithmetic.
    a = jnp.full((n, n), 1.0 / n, jnp.bfloat16)

    def run_mm(k):
        out = a
        for _ in range(k):
            out = mm(a, out)
        jax.device_get(out[0, 0])

    run_mm(3)  # warmup (compile)
    # Tunnel hiccups occasionally poison a slope sample in either direction
    # (recorded across full bench runs: 92-308 TFLOP/s for the same chip,
    # and one 57 GB/s copy against its ~600): take the MEDIAN of 3 attempts
    # per peak; the extra attempts cost milliseconds.
    matmul_flops_per_s = float(np.median([
        2 * n**3 / chained_rate(run_mm, max(trials // 4, 2), trials)
        for _ in range(3)
    ]))

    m = copy_mb * 1024 * 1024 // 4
    x = jnp.zeros((m,), jnp.float32)
    cp = jax.jit(lambda x: x + 1.0)

    def run_cp(k):
        y = x
        for _ in range(k):
            y = cp(y)
        jax.device_get(y[0])

    run_cp(3)
    copy_bytes_per_s = float(np.median([
        2 * m * 4 / chained_rate(run_cp, max(trials // 4, 2), trials)
        for _ in range(3)
    ]))

    return {"matmul_flops_per_s": matmul_flops_per_s,
            "copy_bytes_per_s": copy_bytes_per_s}


def chained_rate(run_k: Callable[[int], None], k1: int, k2: int) -> float:
    """Seconds per iteration from the SLOPE between two window sizes.

    run_k(k) must execute k data-dependent iterations and block on a host
    readback of the final value.  On remote PJRT runtimes (axon tunnel)
    `block_until_ready` acknowledges enqueue, not completion — timing it
    reports dispatch rate, up to ~30x faster than the hardware.  A device_get
    of a scalar is a true barrier; its fixed round-trip cost cancels in the
    two-window slope.

    Host/tunnel interference can stall the small window and push the slope
    non-positive; such windows are re-measured (up to 3x) rather than
    silently reported, with the raw large-window rate — an upper bound that
    still includes the RTT — as the last-resort fallback.  Each fallback
    increments the module counter read by timing_fallbacks(); callers that
    publish numbers (bench.py, measure_latency) surface it so measurements
    taken under interference are identifiable."""
    global _TIMING_FALLBACKS
    for _ in range(3):
        t0 = time.perf_counter()
        run_k(k1)
        t1 = time.perf_counter()
        run_k(k2)
        t2 = time.perf_counter()
        slope = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
        if slope > 0.0:
            return slope
    _TIMING_FALLBACKS += 1
    return (t2 - t1) / k2


_TIMING_FALLBACKS = 0


def timing_fallbacks(reset: bool = False) -> int:
    """Number of chained_rate windows that fell back to the raw large-window
    rate (still containing the device_get RTT) since process start / last
    reset.  Non-zero means some published number may be inflated by host or
    tunnel interference."""
    global _TIMING_FALLBACKS
    n = _TIMING_FALLBACKS
    if reset:
        _TIMING_FALLBACKS = 0
    return n


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
    num_windows: int = 5,
) -> Tuple[float, float]:
    """(mean, std) wall-clock seconds per call.

    Per-call `block_until_ready` timing is meaningless on remote runtimes
    (see chained_rate); instead each of num_windows samples is a two-window
    slope with a device_get barrier — calls are dispatched back-to-back and
    the single in-order TPU core serializes them, so the last call's readback
    bounds them all."""
    jfn = jax.jit(fn)

    def run_k(k):
        out = None
        for _ in range(k):
            out = jfn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    run_k(max(num_warmup_steps, 1))
    k2 = max(num_trials // num_windows, 4)
    k1 = max(k2 // 4, 1)
    before = timing_fallbacks()
    lat = np.asarray(
        [chained_rate(run_k, k1, k2) for _ in range(num_windows)]
    )
    fell_back = timing_fallbacks() - before
    if fell_back:
        import warnings

        warnings.warn(
            f"measure_latency: {fell_back}/{num_windows} windows fell back to "
            "the raw large-window rate (host/tunnel interference); the mean "
            "may be inflated by the readback RTT", RuntimeWarning)
    return float(lat.mean()), float(lat.std())
