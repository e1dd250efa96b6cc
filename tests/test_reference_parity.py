"""Semantic parity vs the ACTUAL reference implementation.

Loads facebookresearch/NasRec (read-only at /root/reference, torch CPU),
warms it up, transplants its weights into nasrec_tpu's params, and compares
logits — fixed-subnet mode and supernet (weight-sharing, masked) mode.
This pins every semantic detail: LN placement, projection elision, masking,
dot-product tril ordering, attention head layout, deep-fm ordering.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "nasrec")), reason="reference not mounted"
)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nasrec_tpu.config import OPS_CONFIG_LIB  # noqa: E402
from nasrec_tpu.choices import choice_to_masks  # noqa: E402
from nasrec_tpu.models import (  # noqa: E402
    SuperNetConfig,
    build_fixed_plan,
    fixed_apply,
    fixed_init,
    supernet_apply,
    supernet_init,
)

VOCAB = 50
NUM_SPARSE = 26
NUM_DENSE = 13

CHOICE = {
    "macro": [
        {"dense_idx": [0], "sparse_idx": [0],
         "dense_left_idx": [0], "dense_right_idx": [0]},
        {"dense_idx": [0, 1], "sparse_idx": [0, 1],
         "dense_left_idx": [1], "dense_right_idx": [0]},
        {"dense_idx": [1, 2], "sparse_idx": [2, 0],
         "dense_left_idx": [2], "dense_right_idx": [1]},
    ],
    # covers: dot-product, transformer, sigmoid-gating, linear-3d,
    # linear-2d, sum + both interact/deep_fm settings
    "micro": [
        {"active_nodes": [1, 4], "dense_in_dims": 64, "sparse_in_dims": 32,
         "dense_sparse_interact": 1, "deep_fm": 1},
        {"active_nodes": [2, 5], "dense_in_dims": 32, "sparse_in_dims": 16,
         "dense_sparse_interact": 0, "deep_fm": 0},
        {"active_nodes": [0, 3, 4], "dense_in_dims": 16, "sparse_in_dims": 48,
         "dense_sparse_interact": 1, "deep_fm": 0},
    ],
}
NUM_BLOCKS = 3


# ---------------------------------------------------------------------------
# torch -> nasrec_tpu weight transplant
# ---------------------------------------------------------------------------


def _t2j(t):
    """torch tensor -> jnp array, with an explicit host copy: jnp.asarray
    zero-copies aligned CPU numpy buffers, which ALIAS torch's parameter
    storage — torch's in-place optimizer step would silently mutate the
    'transplanted' snapshot (caught by the backward-parity tests)."""
    return jnp.asarray(np.array(t.detach().numpy()))


def _lin(mod):
    p = {"w": _t2j(mod.weight.T)}
    if mod.bias is not None:
        p["b"] = _t2j(mod.bias)
    return p


def _ln(mod):
    return {"scale": _t2j(mod.weight), "bias": _t2j(mod.bias)}


def _map_node(node, name: str):
    p = {}
    if name in ("linear-2d", "linear-3d"):
        p["linear"] = _lin(node._linear)
        if node._layernorm is not None:
            p["ln"] = _ln(node._layernorm)
    elif name == "dot-product":
        if getattr(node, "_dense_proj", None) is not None:
            p["dense_proj"] = _lin(node._dense_proj)
            if node._dense_layernorm is not None:
                p["dense_ln"] = _ln(node._dense_layernorm)
        if getattr(node, "_sparse_proj", None) is not None:
            p["sparse_proj"] = _lin(node._sparse_proj)
            if node._sparse_layernorm is not None:
                p["sparse_ln"] = _ln(node._sparse_layernorm)
        if getattr(node, "_sparse_inp_proj", None) is not None:
            p["slot_proj"] = _lin(node._sparse_inp_proj)
            if node._sparse_inp_proj_layernorm is not None:
                p["slot_ln"] = _ln(node._sparse_inp_proj_layernorm)
        if getattr(node, "_linear_proj", None) is not None:
            p["out_proj"] = _lin(node._linear_proj)
        if node._linear_layernorm is not None:
            p["out_ln"] = _ln(node._linear_layernorm)
    elif name == "sum":
        if getattr(node, "_linear_proj", None) is not None:
            p["proj"] = _lin(node._linear_proj)
        if node._layernorm is not None:
            p["ln"] = _ln(node._layernorm)
    elif name == "sigmoid-gating":
        p["self_linear"] = _lin(node._left_self_linear._linear)
        if getattr(node, "_linear_proj", None) is not None:
            p["proj"] = _lin(node._linear_proj)
        if node._layernorm is not None:
            p["ln"] = _ln(node._layernorm)
    elif name == "transformer":
        p["proj"] = _lin(node._linear_proj)
        if node._proj_ln is not None:
            p["proj_ln"] = _ln(node._proj_ln)
        mha = node._mha
        p["mha"] = {
            "w_in": _t2j(mha.in_proj_weight.T),
            "b_in": _t2j(mha.in_proj_bias),
            "w_out": _t2j(mha.out_proj.weight.T),
            "b_out": _t2j(mha.out_proj.bias),
        }
        p["attn_ln"] = _ln(node._attn_ln)
        p["fc1"] = _lin(node.attn_fc1)
        p["fc2"] = _lin(node.attn_fc2)
        p["fc_ln"] = _ln(node._attn_fc_ln)
    elif name in ("zeros-2d", "zeros-3d"):
        pass
    else:
        raise NotImplementedError(name)
    return p


def _map_fm(fm):
    p = {}
    if getattr(fm, "_linear_proj", None) is not None:
        p["proj"] = _lin(fm._linear_proj)
        if getattr(fm, "_linear_layernorm", None) is not None and fm._use_layernorm:
            p["ln"] = _ln(fm._linear_layernorm)
    return p


def _map_block(tb, node_names, active=None):
    if active is None:
        # supernet mode: all nodes, stored as a list (models/supernet.py)
        nodes = [_map_node(tb._nodes[k], name) for k, name in enumerate(node_names)]
    else:
        # fixed mode: only chosen nodes, keyed by index (models/fixed.py)
        nodes = {
            str(k): _map_node(tb._nodes[k], name)
            for k, name in enumerate(node_names)
            if k in active
        }
    p = {"nodes": nodes}
    if getattr(tb, "project_emb_dim", None) is not None:
        p["ds_proj"] = _lin(tb.project_emb_dim)
        if tb.project_emb_dim_layernorm is not None:
            p["ds_ln"] = _ln(tb.project_emb_dim_layernorm)
    if getattr(tb, "deep_fm", None) is not None:
        p["deep_fm"] = _map_fm(tb.deep_fm)
    return p


def _map_model(tm, node_names, fixed_active=None):
    table = jnp.asarray(
        np.concatenate(
            [np.array(e.weight.detach().numpy()) for e in tm._embedding], axis=0
        )
    )
    blocks = []
    for i, tb in enumerate(tm._blocks):
        active = None if fixed_active is None else fixed_active[i]
        blocks.append(_map_block(tb, node_names, active))
    return {
        "embedding": {"table": table},
        "blocks": blocks,
        "final": _lin(tm._final),
    }


def _torch_fixed_model(use_layernorm: bool):
    from nasrec.supernet.supernet import SuperNet, ops_config_lib

    torch.manual_seed(0)
    m = SuperNet(
        num_blocks=NUM_BLOCKS, ops_config=ops_config_lib["xlarge"],
        use_layernorm=use_layernorm, num_embeddings=[VOCAB] * NUM_SPARSE,
        sparse_input_size=NUM_SPARSE, embedding_dim=16,
        path_sampling_strategy="fixed-path", fixed=True, fixed_choice=CHOICE,
    )
    int_x = torch.randn(4, NUM_DENSE)
    cat_x = torch.randint(0, VOCAB, (4, NUM_SPARSE))
    with torch.no_grad():
        m(int_x, cat_x)  # materialise lazy layers / prune elided projections
    return m


@pytest.mark.parametrize("use_layernorm", [False, True])
def test_fixed_subnet_matches_reference(use_layernorm, rng):
    tm = _torch_fixed_model(use_layernorm)
    space = OPS_CONFIG_LIB["xlarge"]
    plan = build_fixed_plan(
        CHOICE, space, NUM_BLOCKS, NUM_DENSE, NUM_SPARSE,
        tuple([VOCAB] * NUM_SPARSE), use_layernorm=use_layernorm,
    )
    # Structural check: our analytically-derived params match the reference's
    # warmed-up LazyLinear shapes leaf for leaf.
    mine = fixed_init(jax.random.PRNGKey(0), plan)
    mapped = _map_model(tm, space.node_names,
                        fixed_active=[set(m["active_nodes"]) for m in CHOICE["micro"]])
    flat_a = jax.tree_util.tree_flatten_with_path(mine)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(mapped)[0]
    paths_a = {jax.tree_util.keystr(p): tuple(l.shape) for p, l in flat_a}
    paths_b = {jax.tree_util.keystr(p): tuple(l.shape) for p, l in flat_b}
    assert paths_a == paths_b

    dense = rng.randn(8, NUM_DENSE).astype(np.float32)
    cat = rng.randint(0, VOCAB, (8, NUM_SPARSE)).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.tensor(dense), torch.tensor(cat)).numpy()
    got = np.asarray(fixed_apply(plan, mapped, jnp.asarray(dense), jnp.asarray(cat)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_layernorm", [True, False])
def test_supernet_masked_forward_matches_reference(use_layernorm, rng):
    """Weight-sharing mode: same sampled subnet through the reference's
    zero-substitution forward and our mask-driven forward."""
    from nasrec.supernet.supernet import SuperNet, ops_config_lib

    torch.manual_seed(1)
    tm = SuperNet(
        num_blocks=NUM_BLOCKS, ops_config=ops_config_lib["xlarge"],
        use_layernorm=use_layernorm, num_embeddings=[VOCAB] * NUM_SPARSE,
        sparse_input_size=NUM_SPARSE, embedding_dim=16,
        path_sampling_strategy="full-path",
    )
    int_x = torch.randn(4, NUM_DENSE)
    cat_x = torch.randint(0, VOCAB, (4, NUM_SPARSE))
    with torch.no_grad():
        tm(int_x, cat_x)  # full-path warmup (shape inference)
    tm.configure_path_sampling_strategy("fixed-path")
    tm.configure_choice(CHOICE)

    dense = rng.randn(8, NUM_DENSE).astype(np.float32)
    cat = rng.randint(0, VOCAB, (8, NUM_SPARSE)).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.tensor(dense), torch.tensor(cat)).numpy()

    space = OPS_CONFIG_LIB["xlarge"]
    cfg = SuperNetConfig(
        space=space, num_blocks=NUM_BLOCKS, num_dense=NUM_DENSE,
        num_sparse=NUM_SPARSE, vocab_sizes=tuple([VOCAB] * NUM_SPARSE),
        use_layernorm=use_layernorm,
    )
    # Structural check against our supernet init.
    mine = supernet_init(jax.random.PRNGKey(0), cfg)
    mapped = _map_model(tm, space.node_names)
    sa = {jax.tree_util.keystr(p): tuple(l.shape)
          for p, l in jax.tree_util.tree_flatten_with_path(mine)[0]}
    sb = {jax.tree_util.keystr(p): tuple(l.shape)
          for p, l in jax.tree_util.tree_flatten_with_path(mapped)[0]}
    assert sa == sb

    masks = choice_to_masks(CHOICE, space, NUM_BLOCKS)
    got = np.asarray(
        supernet_apply(cfg, mapped, jnp.asarray(dense), jnp.asarray(cat), masks)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # Full path must agree as well.
    from nasrec_tpu.choices import full_path_choice

    tm.configure_choice(full_path_choice(space, NUM_BLOCKS))
    with torch.no_grad():
        want_full = tm(torch.tensor(dense), torch.tensor(cat)).numpy()
    masks_full = choice_to_masks(full_path_choice(space, NUM_BLOCKS), space, NUM_BLOCKS)
    got_full = np.asarray(
        supernet_apply(cfg, mapped, jnp.asarray(dense), jnp.asarray(cat), masks_full)
    )
    np.testing.assert_allclose(got_full, want_full, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Backward/optimizer transplant parity: one full training step on BOTH
# frameworks from identical transplanted weights must produce the same
# updated params.  This pins whole-model gradient semantics end-to-end —
# tril-flatten VJP, mask gradients, LN backward, and the
# L2-term -> clip(5.0) -> Adagrad(eps-after-sqrt) composition — which the
# per-piece optimizer tests (test_train.py) cannot see.
# Ref: nasrec/utils/train_utils.py:247-287 (total_loss = BCE + get_l2_loss,
# clip_grad_norm_(5.0), optimizer.step()), nasrec/main_train.py:151-154
# (Adagrad(lr, eps=1e-2)).
# ---------------------------------------------------------------------------


def _torch_l2(model, reg):
    """Reference L2 semantics (ref: nasrec/utils/train_utils.py:91-115 —
    reg * sum of squared L2 norms over params with ndim >= 2; 1-D params
    skipped).  Re-stated here because importing train_utils pulls in
    fvcore, which this environment does not ship."""
    loss = torch.tensor(0.0)
    for _, p in model.named_parameters():
        if len(p.shape) >= 2:
            loss = loss + reg * torch.square(torch.norm(p, p=2))
    return loss


def _torch_train_steps(tm, batches, lr, wd, n_steps):
    """Run n identical reference training steps; returns clip norms."""
    opt = torch.optim.Adagrad(tm.parameters(), lr=lr, eps=1e-2)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    norms = []
    for dense, cat, y in batches[:n_steps]:
        opt.zero_grad()
        logits = tm(torch.tensor(dense), torch.tensor(cat))
        total = loss_fn(logits, torch.tensor(y)) + _torch_l2(tm, wd)
        total.backward()
        norms.append(
            float(torch.nn.utils.clip_grad_norm_(tm.parameters(), 5.0))
        )
        opt.step()
    return norms


def _make_batches(rng, n_steps):
    return [
        (
            rng.randn(8, NUM_DENSE).astype(np.float32),
            rng.randint(0, VOCAB, (8, NUM_SPARSE)).astype(np.int32),
            rng.randint(0, 2, (8, 1)).astype(np.float32),
        )
        for _ in range(n_steps)
    ]


def _assert_tree_close(got, want, rtol, atol):
    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_w = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert len(flat_g) == len(flat_w)
    for path, leaf in flat_g:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_w[key]),
            rtol=rtol, atol=atol, err_msg=key,
        )


def test_backward_transplant_parity_fixed(rng):
    """Two reference training steps vs two make_train_step steps on the
    transplanted fixed subnet: updated params must agree leaf for leaf.
    Two steps (not one) so the second step also pins the adagrad
    accumulator composition (acc += clipped_grad^2 feeding the next
    update)."""
    from nasrec_tpu.train.loop import TrainState, make_train_step
    from nasrec_tpu.train.optim import make_optimizer

    lr, wd, n_steps = 0.12, 0.05, 2
    tm = _torch_fixed_model(use_layernorm=True)
    space = OPS_CONFIG_LIB["xlarge"]
    active = [set(m["active_nodes"]) for m in CHOICE["micro"]]
    params0 = _map_model(tm, space.node_names, fixed_active=active)

    batches = _make_batches(rng, n_steps)
    norms = _torch_train_steps(tm, batches, lr, wd, n_steps)
    # The clip path must actually trigger or the test proves nothing about
    # clip-then-adagrad composition (wd=0.05 over the N(0,1) embedding
    # table guarantees a large L2 gradient norm).
    assert norms[0] > 5.0, norms
    want = _map_model(tm, space.node_names, fixed_active=active)

    plan = build_fixed_plan(
        CHOICE, space, NUM_BLOCKS, NUM_DENSE, NUM_SPARSE,
        tuple([VOCAB] * NUM_SPARSE), use_layernorm=True,
    )
    opt = make_optimizer("adagrad")
    step = make_train_step(
        lambda p, d, c: fixed_apply(plan, p, d, c),
        opt, lambda s: lr, l2_reg=wd, grad_clip=5.0, donate=False,
    )
    state = TrainState(params0, opt.init(params0), jnp.zeros((), jnp.int32))
    for dense, cat, y in batches:
        state, _ = step(state, jnp.asarray(dense), jnp.asarray(cat),
                        jnp.asarray(y))
    _assert_tree_close(state.params, want, rtol=5e-4, atol=2e-5)


def test_backward_transplant_parity_supernet_masked(rng):
    """Same two-step parity in weight-sharing mode: the reference's
    zero-substitution backward vs our mask-driven backward.  Inactive
    nodes' params must move ONLY by their L2 gradient on both sides."""
    from nasrec.supernet.supernet import SuperNet, ops_config_lib

    from nasrec_tpu.train.loop import TrainState, make_train_step
    from nasrec_tpu.train.optim import make_optimizer

    lr, wd, n_steps = 0.12, 0.05, 2
    torch.manual_seed(1)
    tm = SuperNet(
        num_blocks=NUM_BLOCKS, ops_config=ops_config_lib["xlarge"],
        use_layernorm=True, num_embeddings=[VOCAB] * NUM_SPARSE,
        sparse_input_size=NUM_SPARSE, embedding_dim=16,
        path_sampling_strategy="full-path",
    )
    with torch.no_grad():
        tm(torch.randn(4, NUM_DENSE), torch.randint(0, VOCAB, (4, NUM_SPARSE)))
    tm.configure_path_sampling_strategy("fixed-path")
    tm.configure_choice(CHOICE)

    space = OPS_CONFIG_LIB["xlarge"]
    params0 = _map_model(tm, space.node_names)
    batches = _make_batches(rng, n_steps)
    norms = _torch_train_steps(tm, batches, lr, wd, n_steps)
    assert norms[0] > 5.0, norms
    want = _map_model(tm, space.node_names)

    cfg = SuperNetConfig(
        space=space, num_blocks=NUM_BLOCKS, num_dense=NUM_DENSE,
        num_sparse=NUM_SPARSE, vocab_sizes=tuple([VOCAB] * NUM_SPARSE),
        use_layernorm=True,
    )
    masks = choice_to_masks(CHOICE, space, NUM_BLOCKS)
    opt = make_optimizer("adagrad")
    step = make_train_step(
        lambda p, d, c, m: supernet_apply(cfg, p, d, c, m),
        opt, lambda s: lr, l2_reg=wd, grad_clip=5.0, has_masks=True,
        donate=False,
    )
    state = TrainState(params0, opt.init(params0), jnp.zeros((), jnp.int32))
    for dense, cat, y in batches:
        state, _ = step(state, jnp.asarray(dense), jnp.asarray(cat),
                        jnp.asarray(y), masks)
    _assert_tree_close(state.params, want, rtol=5e-4, atol=2e-5)
