"""Fused pairwise dot-product kernel: bit-near parity with the XLA path
(interpret mode on CPU; the compiled path is exercised on TPU by
tools/body_device_check.py's full-forward comparison and the smoke)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nasrec_tpu.ops.kernels.dotprod_pallas import (
    dot_scores_tril_bmajor,
    dot_scores_tril_reference,
    tril_size,
)


@pytest.mark.parametrize("n", [4, 9, 40])
def test_dot_scores_tril_matches_reference(rng, n):
    e, b = 16, 160   # b deliberately not a tile multiple (partial lanes)
    t = jnp.asarray(rng.randn(e, n, b).astype(np.float32))
    got = dot_scores_tril_bmajor(t, True)
    want = dot_scores_tril_reference(t)
    assert got.shape == (tril_size(n), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dot_scores_tril_grad_matches_reference(rng):
    e, n, b = 16, 11, 130
    t = jnp.asarray(rng.randn(e, n, b).astype(np.float32))
    co = jnp.asarray(rng.randn(tril_size(n), b).astype(np.float32))

    g_k = jax.grad(lambda x: jnp.sum(dot_scores_tril_bmajor(x, True) * co))(t)
    g_r = jax.grad(lambda x: jnp.sum(dot_scores_tril_reference(x) * co))(t)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-5, atol=1e-5)


def test_dot_product_apply_flat_pallas_matches_xla(rng):
    """The full node (projections + kernel + out-proj) under both impls,
    values and input grads, at a block-2-like shape."""
    from nasrec_tpu.ops.interactions import dot_product_apply_flat, dot_product_init

    b, d_in, slots, out, e = 96, 160, 21, 768, 16
    p = dot_product_init(jax.random.PRNGKey(0), d_in, slots, out, e,
                         use_layernorm=False)
    dense = jnp.asarray(rng.randn(b, d_in).astype(np.float32))
    sparse = jnp.asarray(rng.randn(b, slots * e).astype(np.float32))

    def run(impl):
        def f(pp, dd, ss):
            return dot_product_apply_flat(pp, dd, ss, slots, e, None, impl=impl)
        val = f(p, dense, sparse)
        g = jax.grad(lambda pp, dd, ss: f(pp, dd, ss).sum(), argnums=(1, 2))(
            p, dense, sparse
        )
        return val, g

    v_x, g_x = run("xla")
    v_p, g_p = run("pallas")
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x),
                               rtol=2e-5, atol=2e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(g_p),
                     jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4)


def test_dot_scores_tril_under_vmap(rng):
    """The search evaluators vmap the supernet over candidates; the kernel
    must batch correctly (pallas batching rule prepends a grid dim)."""
    e, n, b, k = 16, 7, 64, 3
    t = jnp.asarray(rng.randn(k, e, n, b).astype(np.float32))
    got = jax.vmap(lambda x: dot_scores_tril_bmajor(x, True))(t)
    want = jax.vmap(dot_scores_tril_reference)(t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
