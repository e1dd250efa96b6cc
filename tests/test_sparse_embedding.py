"""Sparse-embedding train step must exactly match the dense-gradient step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_apply, fixed_init
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches
from nasrec_tpu.train import make_optimizer, make_train_step
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.sparse_embedding import (
    make_sparse_embedding_train_step,
    rowwise_segment_sum,
    rowwise_segment_sum_slotwise,
)


def test_slotwise_segment_sum_matches_global(rng):
    """The batched per-column sort must produce the same aggregation as the
    flat argsort when indices have the fused-table slot structure (column s
    confined to [offsets[s], offsets[s+1]))."""
    b, s = 64, 5
    vocab = (7, 3, 11, 2, 9)
    offsets = np.asarray(table_offsets(vocab), np.int32)
    cat = np.stack([rng.randint(0, v, size=b) for v in vocab], 1).astype(np.int32)
    idx2d = jnp.asarray(cat + offsets[None, :])
    g = jnp.asarray(rng.randn(b * s, 16).astype(np.float32))

    for glob, slot in (
        (rowwise_segment_sum, rowwise_segment_sum_slotwise),
    ):
        r_g, seg_g, _ = glob(idx2d.reshape(-1), g)
        r_s, seg_s, is_end_s = slot(idx2d, g)
        np.testing.assert_array_equal(np.asarray(r_s), np.asarray(r_g))

        # same aggregation: scatter both to dense and compare against the
        # EXACT float64 per-row sums.  The two implementations round
        # differently by design — the global path telescopes a cumsum over
        # the whole concatenated stream, the slotwise path a per-column
        # cumsum (smaller accumulators, tighter rounding) — so they are
        # compared to the truth, not to each other.
        def densify(r_, seg_, dtype=np.float32):
            dense = np.zeros((int(np.asarray(r_g).max()) + 1, g.shape[1]),
                             dtype)
            np.add.at(dense, np.asarray(r_), np.asarray(seg_, dtype))
            return dense

        exact = densify(idx2d.reshape(-1), g, np.float64).astype(np.float32)
        np.testing.assert_allclose(densify(r_s, seg_s), exact,
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(densify(r_g, seg_g), exact,
                                   rtol=1e-3, atol=1e-5)
        assert np.asarray(is_end_s).sum() == len(np.unique(cat + offsets[None, :]))


def test_rowwise_segment_sum_aggregates_duplicates(rng):
    rows = jnp.asarray(np.array([3, 1, 3, 3, 0, 1], np.int32))
    g = jnp.asarray(rng.randn(6, 4).astype(np.float32))
    r, seg, is_end = rowwise_segment_sum(rows, g)
    gn = np.asarray(g)
    want = {0: gn[4], 1: gn[1] + gn[5], 3: gn[0] + gn[2] + gn[3]}
    # is_end marks exactly the nonzero (segment-final) positions
    np.testing.assert_array_equal(
        np.asarray(is_end), np.abs(np.asarray(seg)).sum(axis=1) > 0
    )
    r, seg = np.asarray(r), np.asarray(seg)
    # scatter-add seg at r reproduces the dense per-row sums
    dense = np.zeros((4, 4), np.float32)
    np.add.at(dense, r, seg)
    for row, w in want.items():
        np.testing.assert_allclose(dense[row], w, rtol=1e-5, atol=1e-6)
    # off-boundary rows contribute exactly zero
    assert (np.abs(seg).sum(axis=1) > 0).sum() == 3


@pytest.mark.parametrize("clip", [5.0, 0.05])
def test_sparse_step_matches_dense_step(clip):
    # vocab=8 guarantees heavy duplicate rows within every batch.
    choice = get_best_arch("criteo-kaggle", "autoctr")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, tuple([8] * 26),
        use_layernorm=False,
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    lr = lambda s: jnp.asarray(0.1)
    spec = SyntheticSpec(vocab=8)
    batches = list(synthetic_batches(5 * 64, 64, spec, seed=0))

    state_dense = init_train_state(params, opt)
    step_dense = make_train_step(
        lambda p, d, c: fixed_apply(plan, p, d, c), opt, lr,
        grad_clip=clip, donate=False,
    )
    for d, c, y in batches:
        state_dense, m_dense = step_dense(state_dense, d, c, y)

    state_sp = init_train_state(params, opt)
    step_sp = make_sparse_embedding_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s), opt, lr,
        table_offsets(plan.vocab_sizes), grad_clip=clip, donate=False,
    )
    for d, c, y in batches:
        state_sp, m_sp = step_sp(state_sp, d, c, y)

    assert float(m_dense["loss"]) == pytest.approx(float(m_sp["loss"]), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(state_sp.params["embedding"]["table"]),
        np.asarray(state_dense.params["embedding"]["table"]),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state_sp.opt_state["embedding"]["table"]),
        np.asarray(state_dense.opt_state["embedding"]["table"]),
        rtol=2e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(state_sp.params["final"]["w"]),
        np.asarray(state_dense.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_microbatched_step_matches_single_shot():
    """microbatch=4 grad accumulation reproduces the single-shot sparse step
    (full-batch clip + duplicate aggregation across slices)."""
    choice = get_best_arch("criteo-kaggle", "autoctr")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, tuple([8] * 26),
        use_layernorm=False,
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    lr = lambda s: jnp.asarray(0.1)
    spec = SyntheticSpec(vocab=8)
    batches = list(synthetic_batches(4 * 128, 128, spec, seed=0))

    mk = lambda m: make_sparse_embedding_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s), opt, lr,
        table_offsets(plan.vocab_sizes), grad_clip=0.05, donate=False,
        microbatch=m,
    )
    state1 = state4 = init_train_state(params, opt)
    step1, step4 = mk(1), mk(4)
    for d, c, y in batches:
        state1, m1 = step1(state1, d, c, y)
        state4, m4 = step4(state4, d, c, y)

    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(m4["logits"]), np.asarray(m1["logits"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state4.params["embedding"]["table"]),
        np.asarray(state1.params["embedding"]["table"]),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state4.params["final"]["w"]),
        np.asarray(state1.params["final"]["w"]),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state4.opt_state["embedding"]["table"]),
        np.asarray(state1.opt_state["embedding"]["table"]),
        rtol=2e-4, atol=1e-7,
    )
