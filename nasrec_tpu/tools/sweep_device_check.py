"""On-device sweep-kernel correctness check (compiled, NOT interpret mode).

The sweep kernel's unit tests run the Pallas interpreter on CPU; two of its
guarantees depend on real-hardware behavior the interpreter cannot pin:

  1. untouched-tile skip — tiles with zero grid steps pass through via the
     input/output alias with NO DMA; the flush semantics of never-visited
     aliased blocks are a hardware/Mosaic property;
  2. skewed traffic — one tile receiving many consecutive window steps
     (small-table CTR skew) exercises the resident-block revisit path.

This tool runs a skewed update (all positions inside the middle tile of
three, plus zero-grad rows elsewhere) through the COMPILED kernel on the
current backend and checks it against the scatter-based reference:
untouched tiles bit-exact, touched rows to 1e-5.  Prints
SWEEP_DEVICE_CHECK_OK.  Wired into scripts/smoke_synthetic.sh so every
smoke run revalidates the aliasing contract on the real TPU.

Run: python -m nasrec_tpu.tools.sweep_device_check
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.train.sparse_embedding import rowwise_segment_sum


def main():
    rng = np.random.RandomState(7)
    tpad = 3 * tsp.ROWS_PER_TILE
    tp = tpad // tsp.GROUP

    # Skew: ~6 windows of positions inside the MIDDLE tile only, with
    # duplicates; outer tiles untouched.
    n = 6 * tsp.CW * tsp.WF
    idx = tsp.ROWS_PER_TILE + rng.randint(0, tsp.ROWS_PER_TILE, size=n)
    g = (rng.randn(n, tsp.EMB) * 0.05).astype(np.float32)
    rows, seg16, _ = rowwise_segment_sum(
        jnp.asarray(idx, jnp.int32), jnp.asarray(g)
    )

    table_np = rng.randn(tp, tsp.LANES).astype(np.float32)
    acc_np = np.abs(rng.randn(tp, tsp.LANES)).astype(np.float32)

    ref_t, ref_a = tsp.sweep_adagrad_update_reference(
        jnp.asarray(table_np), jnp.asarray(acc_np), rows, seg16, 0.12
    )
    new_t, new_a = tsp.sweep_adagrad_update(
        jnp.asarray(table_np), jnp.asarray(acc_np), rows, seg16, 0.12,
        interpret=jax.default_backend() != "tpu",
    )
    new_t, new_a = np.asarray(new_t), np.asarray(new_a)
    ref_t, ref_a = np.asarray(ref_t), np.asarray(ref_a)

    touched = np.zeros(tp, bool)
    touched[np.unique(np.asarray(idx) // tsp.GROUP)] = True
    # outer tiles (never visited by the grid): bit-exact alias pass-through
    k = tsp.K_TILE
    assert not touched[:k].any() and not touched[2 * k:].any()
    np.testing.assert_array_equal(new_t[:k], table_np[:k])
    np.testing.assert_array_equal(new_a[:k], acc_np[:k])
    np.testing.assert_array_equal(new_t[2 * k:], table_np[2 * k:])
    np.testing.assert_array_equal(new_a[2 * k:], acc_np[2 * k:])
    # untouched rows of the VISITED tile: bit-exact zero-delta pass-through
    mid_un = ~touched[k:2 * k]
    np.testing.assert_array_equal(new_t[k:2 * k][mid_un],
                                  table_np[k:2 * k][mid_un])
    # touched rows: match the scatter reference
    np.testing.assert_allclose(new_t[touched], ref_t[touched],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(new_a[touched], ref_a[touched],
                               rtol=1e-5, atol=1e-6)
    print(f"SWEEP_DEVICE_CHECK_OK backend={jax.default_backend()} "
          f"touched={int(touched.sum())}/{tp}", flush=True)


if __name__ == "__main__":
    main()
