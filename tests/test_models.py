"""Model-level tests: supernet forward, fixed-subnet builder, samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.choices import (
    choice_to_masks,
    full_path_choice,
    validate_choice,
)
from nasrec_tpu.configs import BEST_ARCHS, get_best_arch
from nasrec_tpu.models import (
    SuperNetConfig,
    build_fixed_plan,
    fixed_apply,
    fixed_init,
    supernet_apply,
    supernet_init,
)
from nasrec_tpu.sampling import ChoiceSampler

SPEC = DATASETS["test"]


def tiny_batch(rng, batch=4, num_dense=13, num_sparse=26, vocab=100):
    dense = rng.randn(batch, num_dense).astype(np.float32)
    cat = rng.randint(0, vocab, size=(batch, num_sparse)).astype(np.int32)
    return jnp.asarray(dense), jnp.asarray(cat)


def make_cfg(space="xlarge", num_blocks=3, use_layernorm=True):
    return SuperNetConfig(
        space=OPS_CONFIG_LIB[space],
        num_blocks=num_blocks,
        num_dense=SPEC.num_dense,
        num_sparse=SPEC.num_sparse,
        vocab_sizes=SPEC.vocab_sizes(),
        use_layernorm=use_layernorm,
    )


@pytest.mark.parametrize("space", ["xlarge", "xlarge-zeros", "autoctr"])
def test_supernet_forward_shapes(space, rng):
    cfg = make_cfg(space, num_blocks=3)
    params = supernet_init(jax.random.PRNGKey(0), cfg)
    dense, cat = tiny_batch(rng)
    masks = choice_to_masks(full_path_choice(cfg.space, 3), cfg.space, 3)
    out = supernet_apply(cfg, params, dense, cat, masks)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_supernet_one_jit_serves_all_subnets(rng):
    """Different choices must NOT trigger recompilation (static shapes)."""
    cfg = make_cfg("xlarge", num_blocks=3)
    params = supernet_init(jax.random.PRNGKey(0), cfg)
    dense, cat = tiny_batch(rng)

    traces = []

    @jax.jit
    def fwd(params, dense, cat, masks):
        traces.append(1)
        return supernet_apply(cfg, params, dense, cat, masks)

    sampler = ChoiceSampler(cfg.space, 3, strategy="any-path", seed=0)
    outs = []
    for _ in range(4):
        masks = choice_to_masks(sampler(), cfg.space, 3)
        outs.append(np.asarray(fwd(params, dense, cat, masks)))
    assert len(traces) == 1, "supernet recompiled across subnets"
    # Different subnets should produce different logits.
    assert not np.allclose(outs[0], outs[1])


def test_supernet_deterministic(rng):
    cfg = make_cfg("autoctr", num_blocks=2)
    params = supernet_init(jax.random.PRNGKey(1), cfg)
    dense, cat = tiny_batch(rng)
    sampler = ChoiceSampler(cfg.space, 2, strategy="single-path", seed=3)
    masks = choice_to_masks(sampler(), cfg.space, 2)
    a = np.asarray(supernet_apply(cfg, params, dense, cat, masks))
    b = np.asarray(supernet_apply(cfg, params, dense, cat, masks))
    np.testing.assert_array_equal(a, b)


def test_supernet_macro_selection_masks_inputs(rng):
    """With block-1 consuming only the stem, block-0's params must not affect
    the dense path into block 1 (mask-equivalence with zero substitution)."""
    cfg = make_cfg("autoctr", num_blocks=2, use_layernorm=False)
    key = jax.random.PRNGKey(2)
    params = supernet_init(key, cfg)
    dense, cat = tiny_batch(rng)

    choice = full_path_choice(cfg.space, 2)
    # Restrict block 1 to consume only virtual block 0 (the stem).
    choice["macro"][1] = {
        "dense_idx": [0], "sparse_idx": [0],
        "dense_left_idx": [0], "dense_right_idx": [0],
    }
    # Deactivate every node of block 0 except linear-2d; also kill its merge
    # paths so block 0 only feeds block 1 through the (unselected) block-0
    # output. deep_fm/interact of block 0 do not feed block 1's input.
    masks = choice_to_masks(choice, cfg.space, 2)

    out1 = np.asarray(supernet_apply(cfg, params, dense, cat, masks))
    # Perturb block-0 params; final head consumes only the LAST block's
    # outputs (last_n_blocks_out=1) and block 1 ignores block 0 => invariant.
    import copy

    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["blocks"] = list(params2["blocks"])
    params2["blocks"][0] = jax.tree_util.tree_map(
        lambda x: x + 1.0, params["blocks"][0]
    )
    out2 = np.asarray(supernet_apply(cfg, params2, dense, cat, masks))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_supernet_grads_finite(rng):
    cfg = make_cfg("xlarge", num_blocks=2)
    params = supernet_init(jax.random.PRNGKey(3), cfg)
    dense, cat = tiny_batch(rng)
    masks = choice_to_masks(full_path_choice(cfg.space, 2), cfg.space, 2)
    y = jnp.asarray(rng.randint(0, 2, size=(4, 1)).astype(np.float32))

    def loss_fn(p):
        logits = supernet_apply(cfg, p, dense, cat, masks)
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # final layer must receive gradient
    assert np.abs(np.asarray(g["final"]["w"])).sum() > 0


# ---------------------------------------------------------------------------
# Fixed subnets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("key", sorted(BEST_ARCHS.keys()))
def test_fixed_best_archs_build_and_run(key, rng):
    dataset, space_name = key
    choice = get_best_arch(dataset, space_name)
    space = OPS_CONFIG_LIB[space_name]
    spec = DATASETS[dataset]
    plan = build_fixed_plan(
        choice, space, 7, spec.num_dense, spec.num_sparse,
        tuple([101] * spec.num_sparse),  # tiny vocab for the test
        use_layernorm=False,
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    dense = jnp.asarray(rng.randn(4, spec.num_dense).astype(np.float32))
    cat = jnp.asarray(rng.randint(0, 100, size=(4, spec.num_sparse)).astype(np.int32))
    out = fixed_apply(plan, params, dense, cat)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fixed_plan_widths_criteo_xlarge():
    """Hand-checked widths for the published Criteo xlarge best arch."""
    choice = get_best_arch("criteo-kaggle", "xlarge")
    space = OPS_CONFIG_LIB["xlarge"]
    plan = build_fixed_plan(
        choice, space, 7, 13, 26, tuple([101] * 26), use_layernorm=False
    )
    b0 = plan.blocks[0]
    assert b0.dense_in == 13 and b0.sparse_in == 26
    assert b0.out_slots == 64 + 8  # interact=1
    b1 = plan.blocks[1]
    assert b1.dense_in == 13  # consumes stem only
    assert b1.out_slots == 64  # interact=0
    b2 = plan.blocks[2]
    # dense_idx (1,2) -> widths 128 + 32
    assert b2.dense_in == 128 + 32
    # sparse_idx (0,1,2) -> 26 + 72 + 64
    assert b2.sparse_in == 26 + 72 + 64
    # head: dense 128 + slots 48 * 16
    assert plan.head_width == 128 + 48 * 16


def test_fixed_grads_finite(rng):
    choice = get_best_arch("criteo-kaggle", "xlarge")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["xlarge"], 7, 13, 26, tuple([101] * 26),
        use_layernorm=False,
    )
    params = fixed_init(jax.random.PRNGKey(1), plan)
    dense = jnp.asarray(rng.randn(8, 13).astype(np.float32))
    cat = jnp.asarray(rng.randint(0, 100, size=(8, 26)).astype(np.int32))
    y = jnp.asarray(rng.randint(0, 2, size=(8, 1)).astype(np.float32))

    def loss_fn(p):
        logits = fixed_apply(plan, p, dense, cat)
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    g = jax.grad(loss_fn)(params)
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g)
    )


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("strategy", ["default", "single-path", "any-path", "full-path"])
@pytest.mark.parametrize("space_name", ["xlarge", "xlarge-zeros", "autoctr"])
def test_sampled_choices_are_valid(strategy, space_name):
    space = OPS_CONFIG_LIB[space_name]
    sampler = ChoiceSampler(space, 7, strategy=strategy, seed=0)
    for _ in range(50):
        validate_choice(sampler(), space, 7)


def test_fixed_path_memoises():
    space = OPS_CONFIG_LIB["xlarge"]
    sampler = ChoiceSampler(space, 7, strategy="fixed-path", seed=0)
    c1, c2 = sampler(), sampler()
    assert c1 is c2  # same subnet every step (ref: supernet.py:490-491)


def test_warmup_prefers_full_path():
    space = OPS_CONFIG_LIB["xlarge"]
    sampler = ChoiceSampler(
        space, 7, strategy="single-path", supernet_training_steps=10_000, seed=0
    )
    full = full_path_choice(space, 7)
    sampler()  # step 0: thresh=0 by the counter convention
    n_full = sum(1 for _ in range(100) if sampler() == full)
    assert n_full >= 95  # early steps ~always full path


def test_anypath_fan_in_capped_at_4():
    space = OPS_CONFIG_LIB["xlarge"]
    sampler = ChoiceSampler(space, 7, strategy="any-path", anypath_choice="uniform", seed=1)
    for _ in range(100):
        c = sampler()
        for m in c["macro"]:
            assert len(m["dense_idx"]) <= 4
            assert len(m["sparse_idx"]) <= 4


def test_evo_2shot_samples_from_candidates():
    space = OPS_CONFIG_LIB["xlarge"]
    cands = []
    base = ChoiceSampler(space, 3, strategy="single-path", seed=5)
    for _ in range(3):
        cands.append({"choice": base()})
    sampler = ChoiceSampler(
        space, 3, strategy="evo-2shot-path", candidate_choices=cands, seed=0
    )
    for _ in range(10):
        sampled = sampler()
        assert any(sampled == c["choice"] for c in cands)


def test_remat_blocks_equivalent(rng):
    import dataclasses

    choice = get_best_arch("criteo-kaggle", "xlarge")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["xlarge"], 7, 13, 26, tuple([64] * 26),
        use_layernorm=False,
    )
    plan_r = dataclasses.replace(plan, remat_blocks=True)
    params = fixed_init(jax.random.PRNGKey(0), plan)
    d = jnp.asarray(rng.randn(4, 13).astype(np.float32))
    c = jnp.asarray(rng.randint(0, 64, size=(4, 26)).astype(np.int32))
    a = np.asarray(fixed_apply(plan, params, d, c))
    b = np.asarray(fixed_apply(plan_r, params, d, c))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    ga = jax.grad(lambda p: float(0) + jnp.sum(fixed_apply(plan, p, d, c)))(params)
    gb = jax.grad(lambda p: jnp.sum(fixed_apply(plan_r, p, d, c)))(params)
    for x_, y_ in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_), rtol=1e-5, atol=1e-6)


def test_fixed_last_n_blocks_out(rng):
    """Fixed-mode head over the last n blocks (ref: supernet.py:226,657-660)."""
    from nasrec_tpu.choices import full_path_choice

    space = OPS_CONFIG_LIB["autoctr"]
    choice = full_path_choice(space, 3)
    plan1 = build_fixed_plan(choice, space, 3, 13, 26, tuple([50] * 26))
    plan2 = build_fixed_plan(
        choice, space, 3, 13, 26, tuple([50] * 26), last_n_blocks_out=2
    )
    params2 = fixed_init(jax.random.PRNGKey(0), plan2)
    d = jnp.asarray(rng.randn(4, 13).astype(np.float32))
    c = jnp.asarray(rng.randint(0, 50, size=(4, 26)).astype(np.int32))
    out = fixed_apply(plan2, params2, d, c)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()
    # head fan-in covers two blocks of dense + two blocks of sparse
    assert plan2.head_width > plan1.head_width
    assert params2["final"]["w"].shape[0] == plan2.head_width
    g = jax.grad(lambda p: jnp.sum(fixed_apply(plan2, p, d, c)))(params2)
    assert np.isfinite(np.asarray(g["final"]["w"])).all()


def test_fixed_last_n_blocks_out_rejects_unequal_slots():
    """torch.cat(dim=-1) over unequal slot counts is impossible; the plan
    builder must say so up front."""
    from nasrec_tpu.search import Tokenizer

    space = OPS_CONFIG_LIB["autoctr"]
    tok = Tokenizer(3, space, seed=0)
    for _ in range(50):
        choice = tok.generate_random_choice()
        # engineer unequal tail slots: vary sparse dims + interact bits
        s1 = int(choice["micro"][1]["sparse_in_dims"])
        s2 = int(choice["micro"][2]["sparse_in_dims"])
        i1 = int(choice["micro"][1]["dense_sparse_interact"])
        i2 = int(choice["micro"][2]["dense_sparse_interact"])
        if s1 + 8 * i1 != s2 + 8 * i2:
            break
    else:
        raise AssertionError("never sampled unequal tail slots")
    with pytest.raises(ValueError, match="last_n_blocks_out"):
        build_fixed_plan(
            choice, space, 3, 13, 26, tuple([50] * 26), last_n_blocks_out=2
        )
