"""Fused tiny-head attention kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.ops.kernels.attention_pallas import (
    fused_tiny_head_attention,
    mha_reference,
)


@pytest.mark.parametrize("shape", [(8, 64, 16), (16, 48, 16), (4, 16, 16)])
def test_forward_matches_reference(shape, rng):
    b, s, e = shape
    q = jnp.asarray(rng.randn(b, s, e).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, e).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, e).astype(np.float32))
    got = fused_tiny_head_attention(q, k, v, 8, True)
    want = mha_reference(q, k, v, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference(rng):
    b, s, e = 8, 32, 16
    q = jnp.asarray(rng.randn(b, s, e).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, e).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, e).astype(np.float32))
    w = jnp.asarray(rng.randn(b, s, e).astype(np.float32))  # cotangent weights

    def loss_kernel(q, k, v):
        return jnp.sum(fused_tiny_head_attention(q, k, v, 8, True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, 8) * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-4)


def test_transformer_node_pallas_impl_matches_xla(rng):
    from nasrec_tpu.ops import transformer_apply, transformer_init
    from nasrec_tpu.choices import prefix_mask

    p = transformer_init(jax.random.PRNGKey(0), 26, 32, 16, use_layernorm=True)
    x = jnp.asarray(rng.randn(8, 26, 16).astype(np.float32))
    mask = jnp.asarray(prefix_mask(32, 20))
    a = transformer_apply(p, x, mask, impl="xla")
    b = transformer_apply(p, x, mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fixed_model_pallas_attention(rng):
    """Whole fixed model with pallas attention == xla attention (fwd+grad)."""
    from nasrec_tpu.config import OPS_CONFIG_LIB
    from nasrec_tpu.configs import get_best_arch
    from nasrec_tpu.models import build_fixed_plan, fixed_apply, fixed_init
    import dataclasses

    choice = get_best_arch("criteo-kaggle", "xlarge")
    plan_x = build_fixed_plan(
        choice, OPS_CONFIG_LIB["xlarge"], 7, 13, 26, tuple([64] * 26),
        use_layernorm=False,
    )
    plan_p = dataclasses.replace(plan_x, attention_impl="pallas")
    params = fixed_init(jax.random.PRNGKey(0), plan_x)
    d = jnp.asarray(rng.randn(8, 13).astype(np.float32))
    c = jnp.asarray(rng.randint(0, 64, size=(8, 26)).astype(np.int32))
    a = fixed_apply(plan_x, params, d, c)
    b = fixed_apply(plan_p, params, d, c)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    ga = jax.grad(lambda p: jnp.sum(fixed_apply(plan_x, p, d, c)))(params)
    gb = jax.grad(lambda p: jnp.sum(fixed_apply(plan_p, p, d, c)))(params)
    la, lb = jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
    for x_, y_ in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_), rtol=5e-3, atol=1e-4)


def test_fused_body_matches_unfused(rng):
    """The fully-fused transformer-body kernel (qkv/attention/out/LN/FFN/LN
    in one pallas_call + one backward pallas_call producing all param grads)
    must match the op-by-op b-major path, fwd and vjp, with and without a
    slot mask."""
    from nasrec_tpu.ops.attention import (
        _transformer_bmajor,
        _transformer_bmajor_unfused,
        transformer_init,
    )

    e, s_out, b, h = 16, 24, 128, 8
    p = transformer_init(jax.random.PRNGKey(3), 26, s_out, e, use_layernorm=False)
    xb = jnp.asarray(rng.randn(e, s_out, b).astype(np.float32) * 0.3)
    ct = jnp.asarray(rng.randn(e, s_out, b).astype(np.float32))
    mask = jnp.asarray((np.arange(s_out) < 20).astype(np.float32))

    for m in (None, mask):
        yf, vjpf = jax.vjp(lambda pp, xx: _transformer_bmajor(pp, xx, m, h), p, xb)
        yg, vjpg = jax.vjp(
            lambda pp, xx: _transformer_bmajor_unfused(pp, xx, m, h), p, xb
        )
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yg),
                                   rtol=1e-5, atol=1e-5)
        gf, gg = vjpf(ct), vjpg(ct)
        for a, b_ in zip(jax.tree_util.tree_leaves(gf),
                         jax.tree_util.tree_leaves(gg)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)


def test_fused_body_bf16_compute(rng):
    """AMP: bf16 activations run through the fused kernel (f32 internal
    math) and track the f32 result."""
    from nasrec_tpu.ops.attention import _transformer_bmajor, transformer_init

    e, s_out, b, h = 16, 16, 128, 8
    p = transformer_init(jax.random.PRNGKey(1), 20, s_out, e, use_layernorm=False)
    xb = jnp.asarray(rng.randn(e, s_out, b).astype(np.float32) * 0.3)
    y32 = _transformer_bmajor(p, xb, None, h)
    y16 = _transformer_bmajor(p, xb.astype(jnp.bfloat16), None, h)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16.astype(jnp.float32)), np.asarray(y32),
        rtol=2e-2, atol=2e-2,
    )


def test_supernet_pallas_attention_matches_xla(rng):
    """Supernet forward+grad with the fused pallas body (masked elastic
    slots) == the XLA implementation."""
    import dataclasses
    from nasrec_tpu.config import OPS_CONFIG_LIB
    from nasrec_tpu.choices import choice_to_masks
    from nasrec_tpu.models import SuperNetConfig, supernet_apply, supernet_init
    from nasrec_tpu.sampling import ChoiceSampler

    space = OPS_CONFIG_LIB["xlarge"]
    cfg_x = SuperNetConfig(
        space=space, num_blocks=3, num_dense=13, num_sparse=26,
        vocab_sizes=tuple([32] * 26), use_layernorm=True,
        attention_impl="xla",
    )
    cfg_p = dataclasses.replace(cfg_x, attention_impl="pallas")
    params = supernet_init(jax.random.PRNGKey(0), cfg_x)
    sampler = ChoiceSampler(space, 3, strategy="default", seed=5)
    masks = choice_to_masks(sampler(), space, 3)
    d = jnp.asarray(rng.randn(128, 13).astype(np.float32))
    c = jnp.asarray(rng.randint(0, 32, size=(128, 26)).astype(np.int32))

    a = supernet_apply(cfg_x, params, d, c, masks)
    b = supernet_apply(cfg_p, params, d, c, masks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)

    ga = jax.grad(lambda p: jnp.sum(supernet_apply(cfg_x, p, d, c, masks)))(params)
    gb = jax.grad(lambda p: jnp.sum(supernet_apply(cfg_p, p, d, c, masks)))(params)
    for x_, y_ in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   rtol=5e-3, atol=2e-4)


def test_body_pick_tile_divisibility_fallback():
    """_pick_tile(bwd=True) honours the documented multiples-of-128 contract:
    B=640 at S=16 fits the 512 tile but must fall back to 128 (the largest
    fitting tile that divides B) instead of raising (r3 advisor finding)."""
    from nasrec_tpu.ops.kernels.transformer_body_pallas import _pick_tile

    assert _pick_tile(640, 16, 16, bwd=True) == 128
    assert _pick_tile(512, 16, 16, bwd=True) == 512
    assert _pick_tile(256, 16, 16, bwd=True) == 256
    # whole-batch tiles below 128 have no padding lanes and stay legal
    assert _pick_tile(64, 16, 16, bwd=True) == 64
    # batches under the largest fitting tile run as ONE whole-batch tile
    # (no padding lanes), so any size is legal there
    assert _pick_tile(200, 16, 16, bwd=True) == 200
    # above it, batches that no fitting tile divides still raise
    import pytest

    with pytest.raises(ValueError):
        _pick_tile(600, 16, 16, bwd=True)
    # forward (eval) accepts any batch
    assert _pick_tile(640, 16, 16, bwd=False) >= 128
