"""Golden tests for the operator library against NumPy reference formulas.

Mirrors the reference's runtime-assert discipline (SURVEY.md §4.3) with real
unit tests: each searchable op is checked against an independent NumPy
implementation of the semantics in nasrec/supernet/modules.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.ops import (
    dot_product_apply,
    dot_product_init,
    elastic_linear3d_apply,
    elastic_linear3d_init,
    elastic_linear_apply,
    elastic_linear_init,
    fm3d_apply,
    fm3d_init,
    sigmoid_gating_apply,
    sigmoid_gating_init,
    sum_apply,
    sum_init,
    transformer_apply,
    transformer_init,
)
from nasrec_tpu.ops.common import ln_apply, ln_init
from nasrec_tpu.ops.interactions import dot_product_slot_dim
from nasrec_tpu.choices import prefix_mask


def np_ln(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def test_layernorm_matches_numpy(rng):
    x = rng.randn(4, 32).astype(np.float32)
    p = ln_init(32)
    got = np.asarray(ln_apply(p, jnp.asarray(x)))
    want = np_ln(x, np.asarray(p["scale"]), np.asarray(p["bias"]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_elastic_linear_masked(rng):
    key = jax.random.PRNGKey(0)
    p = elastic_linear_init(key, 24, 64, use_layernorm=True)
    x = rng.randn(8, 24).astype(np.float32)
    mask = prefix_mask(64, 16)
    out = np.asarray(
        elastic_linear_apply(p, jnp.asarray(x), "relu", jnp.asarray(mask))
    )
    # Masked region exactly zero; unmasked region = relu(LN(xW)).
    assert np.all(out[:, 16:] == 0.0)
    w = np.asarray(p["linear"]["w"])
    pre = x @ w
    want = np.maximum(np_ln(pre, np.asarray(p["ln"]["scale"]), np.asarray(p["ln"]["bias"])), 0)
    np.testing.assert_allclose(out[:, :16], want[:, :16], rtol=1e-4, atol=1e-4)


def test_elastic_linear_no_ln_has_bias(rng):
    key = jax.random.PRNGKey(1)
    p = elastic_linear_init(key, 8, 8, use_layernorm=False)
    assert "b" in p["linear"] and "ln" not in p


def test_elastic_linear3d_shapes_and_mask(rng):
    key = jax.random.PRNGKey(2)
    p = elastic_linear3d_init(key, in_slots=10, out_slots=6, use_layernorm=False)
    x = rng.randn(4, 10, 16).astype(np.float32)
    mask = prefix_mask(6, 3)
    out = np.asarray(
        elastic_linear3d_apply(p, jnp.asarray(x), "relu", jnp.asarray(mask))
    )
    assert out.shape == (4, 6, 16)
    assert np.all(out[:, 3:, :] == 0.0)
    # Linear over slot axis: out[b, s, e] = relu(sum_t x[b,t,e] * w[t,s])
    w = np.asarray(p["linear"]["w"])
    b = np.asarray(p["linear"]["b"])
    want = np.maximum(np.einsum("bte,ts->bse", x, w) + b[None, :, None], 0)
    np.testing.assert_allclose(out[:, :3], want[:, :3], rtol=1e-4, atol=1e-4)


def test_sum_pads_and_projects(rng):
    key = jax.random.PRNGKey(3)
    left = rng.randn(5, 8).astype(np.float32)
    right = rng.randn(5, 12).astype(np.float32)
    p = sum_init(key, 8, 12, out_dim=16, use_layernorm=False)
    out = np.asarray(sum_apply(p, jnp.asarray(left), jnp.asarray(right)))
    padded = np.concatenate([left, np.zeros((5, 4), np.float32)], 1) + right
    want = padded @ np.asarray(p["proj"]["w"]) + np.asarray(p["proj"]["b"])
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_sum_projection_elided_when_width_matches(rng):
    key = jax.random.PRNGKey(4)
    p = sum_init(key, 16, 16, out_dim=16, use_layernorm=False)
    assert "proj" not in p  # ref: modules.py:488-491
    left = rng.randn(3, 16).astype(np.float32)
    right = rng.randn(3, 16).astype(np.float32)
    out = np.asarray(sum_apply(p, jnp.asarray(left), jnp.asarray(right)))
    np.testing.assert_allclose(out, left + right, rtol=1e-6)


def test_sigmoid_gating(rng):
    key = jax.random.PRNGKey(5)
    left = rng.randn(6, 10).astype(np.float32)
    right = rng.randn(6, 10).astype(np.float32)
    p = sigmoid_gating_init(key, 10, 10, out_dim=10, use_layernorm=False)
    assert "proj" not in p  # width == out_dim -> elided (ref: modules.py:583-586)
    out = np.asarray(sigmoid_gating_apply(p, jnp.asarray(left), jnp.asarray(right)))
    w = np.asarray(p["self_linear"]["w"])
    b = np.asarray(p["self_linear"]["b"])
    gate = 1.0 / (1.0 + np.exp(-(left @ w + b)))
    np.testing.assert_allclose(out, gate * right, rtol=1e-4, atol=1e-5)


def test_fm3d_matches_numpy(rng):
    key = jax.random.PRNGKey(6)
    x = rng.randn(4, 7, 16).astype(np.float32)
    p = fm3d_init(key, feat_dim=16, out_dim=32, use_layernorm=False)
    out = np.asarray(fm3d_apply(p, jnp.asarray(x)))
    ix = x.sum(1) ** 2 - (x**2).sum(1)
    want = ix @ np.asarray(p["proj"]["w"]) + np.asarray(p["proj"]["b"])
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-3)


def test_fm3d_identity_when_dims_match(rng):
    key = jax.random.PRNGKey(7)
    p = fm3d_init(key, feat_dim=16, out_dim=16, use_layernorm=True)
    assert p == {}  # proj AND ln elided (ref: modules.py:739-743)
    x = rng.randn(2, 3, 16).astype(np.float32)
    out = np.asarray(fm3d_apply(p, jnp.asarray(x)))
    want = x.sum(1) ** 2 - (x**2).sum(1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_dot_product_slot_dim():
    # round(sqrt(2*1024)) = 45 (ref: modules.py:298)
    assert dot_product_slot_dim(1024) == 45
    assert dot_product_slot_dim(128) == 16
    assert dot_product_slot_dim(16) == 6


def test_dot_product_structure_and_values(rng):
    key = jax.random.PRNGKey(8)
    B, D, S, E, OUT = 3, 20, 9, 16, 32
    p = dot_product_init(key, D, S, OUT, E, use_layernorm=False)
    assert "dense_proj" in p      # D != E
    assert "sparse_proj" not in p  # feat dim == E
    assert "slot_proj" in p        # S != slot_dim(32)=8
    assert "out_proj" in p         # 9*8/2=36 != 32
    dense = rng.randn(B, D).astype(np.float32)
    sparse = rng.randn(B, S, E).astype(np.float32)
    out = np.asarray(dot_product_apply(p, jnp.asarray(dense), jnp.asarray(sparse)))

    # NumPy reference
    x = dense @ np.asarray(p["dense_proj"]["w"]) + np.asarray(p["dense_proj"]["b"])
    yt = np.einsum("bse,st->bte", sparse, np.asarray(p["slot_proj"]["w"])) + np.asarray(
        p["slot_proj"]["b"]
    )[None, :, None]
    t = np.concatenate([x[:, None, :], yt], axis=1)  # [B, 9, E]
    z = np.einsum("bne,bme->bnm", t, t)
    li, lj = np.tril_indices(t.shape[1], k=-1)
    zflat = z[:, li, lj]
    want = zflat @ np.asarray(p["out_proj"]["w"]) + np.asarray(p["out_proj"]["b"])
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-3)
    assert out.shape == (B, OUT)


def test_dot_product_supernet_widths():
    # Supernet-mode block 0 on criteo xlarge: D=13, S=26, out=1024.
    key = jax.random.PRNGKey(9)
    p = dot_product_init(key, 13, 26, 1024, 16, use_layernorm=True)
    # 46*45/2 = 1035 != 1024 -> out_proj exists; final LN always on.
    assert "out_proj" in p and "out_ln" in p
    dense = jnp.ones((2, 13))
    sparse = jnp.ones((2, 26, 16))
    out = dot_product_apply(p, dense, sparse)
    assert out.shape == (2, 1024)


def test_transformer_shapes_and_mask(rng):
    key = jax.random.PRNGKey(10)
    p = transformer_init(key, in_slots=26, out_slots=8, emb_dim=16, use_layernorm=True)
    x = rng.randn(4, 26, 16).astype(np.float32)
    mask = prefix_mask(8, 5)
    out = np.asarray(transformer_apply(p, jnp.asarray(x), jnp.asarray(mask)))
    assert out.shape == (4, 8, 16)
    assert np.all(out[:, 5:, :] == 0.0)
    # LN residual weights initialised to 0.17 (ref: modules.py:598,637)
    np.testing.assert_allclose(np.asarray(p["attn_ln"]["scale"]), 0.17)
    np.testing.assert_allclose(np.asarray(p["fc_ln"]["scale"]), 0.17)


def test_transformer_attention_math(rng):
    """MHA against a NumPy softmax-attention reference."""
    key = jax.random.PRNGKey(11)
    E, H = 16, 8
    p = transformer_init(key, in_slots=4, out_slots=4, emb_dim=E, use_layernorm=False)
    x = rng.randn(2, 4, E).astype(np.float32)

    from nasrec_tpu.ops.attention import _mha

    got = np.asarray(_mha(p["mha"], jnp.asarray(x), H))

    w_in = np.asarray(p["mha"]["w_in"])
    b_in = np.asarray(p["mha"]["b_in"])
    qkv = x @ w_in + b_in
    q, k, v = np.split(qkv, 3, axis=-1)
    hd = E // H

    def heads(t):
        return t.reshape(2, 4, H, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(2, 4, E)
    want = o @ np.asarray(p["mha"]["w_out"]) + np.asarray(p["mha"]["b_out"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
