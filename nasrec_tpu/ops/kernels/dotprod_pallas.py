"""Pallas fused pairwise dot-product scores (the DotProduct node's core).

The DotProduct interaction (ref: nasrec/supernet/modules.py:273-401)
computes all pairwise slot dots z[b,i,j] = sum_e t[b,e,i] t[b,e,j] and keeps
the strict lower triangle.  XLA lowers the einsum to B batched [n,16]x[16,n]
GEMMs — the same MXU-ISSUE-bound tiny-dot pathology the attention kernel's
gen-2 hit (~10+ cycles per dot, one per batch row; see
ops/kernels/attention_pallas.py), plus an 8x-lane-padded [B, n, n] score
tensor (n<=46 pads to 128 lanes) materialised in HBM for the triangle
slicing, in both directions.

This kernel uses the attention gen-3 trick: BATCH ON LANES.  With t as
[E, n, B], a score row is a sum of E broadcast-fma terms over [i, B] slabs —
pure lane-parallel VPU work, no per-row dots, no transposes inside — and the
output is written DIRECTLY as the row-major strict-lower-triangle flatten
[P, B] (P = n(n-1)/2), so no [B, n, n] tensor ever exists:

    z[p(i,j), b] = sum_e t[e,i,b] t[e,j,b]        (j < i, row-major order)

matching ops/interactions._dot_product_tail's `concat(z[:, i, :i])` layout
exactly.  The backward reconstructs the symmetric full matrix from dz with
one STATIC-index take (layout-friendly row copies, done in XLA where it
fuses with the out-projection's grad) and runs the mirrored fma reduction:

    dt[e,i,b] = sum_j full[i,j,b] t[e,j,b],  full[i,j] = dz[p(max,min)], 0 diag

The batch axis is purely elementwise, so partial lane tiles are safe in
both directions (out-of-bounds lanes compute garbage the block write masks).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 48 * 1024 * 1024
VMEM_LIMIT = 100 * 1024 * 1024


def _cdiv(a, b):
    return -(-a // b)


def tril_size(n: int) -> int:
    return n * (n - 1) // 2


def _pick_tile(b: int, e: int, n: int, *, bwd: bool) -> int:
    """Largest lane tile fitting VMEM: io blocks (double-buffered) + a few
    live [n, B]-slab transients."""
    p = tril_size(n)
    io = (e * n + p + (n * n if bwd else 0)) * 2 * 2   # in+out, double-buffer
    transients = 8 * n
    per_lane = 4 * (io + transients)
    for t in (1024, 512, 256, 128):
        if t * per_lane <= VMEM_BUDGET:
            return min(t, max(128, b))
    raise ValueError(
        f"dot-product kernel: no batch tile fits VMEM at n={n} "
        f"(per-lane bytes {per_lane}); use the XLA path for this shape"
    )


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _fwd_kernel(t_ref, z_ref):
    t = t_ref[:].astype(jnp.float32)              # [E, n, TB]
    e, n, _ = t.shape
    rows = []
    for i in range(1, n):
        zi = t[0, i][None, :] * t[0, :i]          # [i, TB]
        for d in range(1, e):
            zi = zi + t[d, i][None, :] * t[d, :i]
        rows.append(zi)
    z_ref[:] = jnp.concatenate(rows, axis=0).astype(z_ref.dtype)


def _bwd_kernel(t_ref, full_ref, dt_ref):
    t = t_ref[:].astype(jnp.float32)              # [E, n, TB]
    full = full_ref[:].astype(jnp.float32)        # [n, n, TB] sym, 0 diag
    e, n, _ = t.shape
    outs = []
    for d in range(e):
        # full[:, j, :] == full[j] by SYMMETRY — the first-axis slice is a
        # contiguous sublane block, while the middle-axis slice forced a
        # Mosaic relayout per j term (measured 7.8 -> 1.4 ms at the
        # flagship b2 shape, experiments/probe_dotprod_b2.py round 5).
        acc = full[0] * t[d, 0][None, :]          # [n, TB]
        for j in range(1, n):
            acc = acc + full[j] * t[d, j][None, :]
        outs.append(acc)
    dt_ref[:] = jnp.stack(outs, axis=0).astype(dt_ref.dtype)


def _spec(rows, mid, tb):
    return pl.BlockSpec((rows, mid, tb), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


def _spec2(rows, tb):
    return pl.BlockSpec((rows, tb), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _run_fwd(t, interpret):
    e, n, b = t.shape
    tb = _pick_tile(b, e, n, bwd=False)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((tril_size(n), b), t.dtype),
        grid=(_cdiv(b, tb),),
        in_specs=[_spec(e, n, tb)],
        out_specs=_spec2(tril_size(n), tb),
        compiler_params=_params(),
        interpret=interpret,
    )(t)


def _sym_index(n: int) -> np.ndarray:
    """[n*n] static row indices into dz padded with a zero row at P:
    full[i, j] = dz[p(max(i,j), min(i,j))], diagonal -> the zero row."""
    idx = np.full((n, n), tril_size(n), np.int32)
    p = 0
    for i in range(1, n):
        for j in range(i):
            idx[i, j] = p
            idx[j, i] = p
            p += 1
    return idx.reshape(-1)


def _run_bwd(t, dz, interpret):
    e, n, b = t.shape
    # Symmetric full matrix from the triangle: one static take of b-major
    # rows (plain row copies; XLA fuses it with dz's producer).
    dz_pad = jnp.concatenate(
        [dz, jnp.zeros((1, b), dz.dtype)], axis=0
    )
    full = jnp.take(dz_pad, jnp.asarray(_sym_index(n)), axis=0).reshape(n, n, b)
    tb = _pick_tile(b, e, n, bwd=True)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((e, n, b), t.dtype),
        grid=(_cdiv(b, tb),),
        in_specs=[_spec(e, n, tb), _spec(n, n, tb)],
        out_specs=_spec(e, n, tb),
        compiler_params=_params(),
        interpret=interpret,
    )(t, full)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def dot_scores_tril_bmajor(t, interpret: bool = False):
    """Pairwise-dot strict-lower-triangle on batch-on-lanes operands:
    t [E, n, B] -> z [n(n-1)/2, B], rows in the reference's row-major
    triangle order (ref tril_indices flatten: modules.py:366-383)."""
    return _run_fwd(t, interpret)


def _vjp_fwd(t, interpret):
    return _run_fwd(t, interpret), t


def _vjp_bwd(interpret, t, g):
    return (_run_bwd(t, g, interpret),)


dot_scores_tril_bmajor.defvjp(_vjp_fwd, _vjp_bwd)


def dot_scores_tril_reference(t):
    """jnp reference with identical layout (tests)."""
    z = jnp.einsum("enb,emb->nmb", t, t)
    n = t.shape[1]
    return jnp.concatenate([z[i, :i] for i in range(1, n)], axis=0)
