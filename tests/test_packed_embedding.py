"""Packed-table embedding path: layout round-trip, sorted lookup,
aggregation, the Pallas sweep kernel (interpret mode on CPU), and full-step
numerical equivalence with the flat sparse step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.ops.kernels.embedding_sweep_pallas import (
    aggregate_updates,
    pack_table,
    packed_lookup_sorted,
    sweep_adagrad_update,
    sweep_adagrad_update_reference,
    unpack_table,
)
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.packed_embedding import (
    make_packed_sparse_train_step,
    pack_embedding_params,
)
from nasrec_tpu.train.sparse_embedding import make_sparse_embedding_train_step


def test_pack_unpack_roundtrip(rng):
    t = jnp.asarray(rng.randn(37, 16).astype(np.float32))  # not a multiple of 8
    p = pack_table(t)
    assert p.shape == (5, 128)
    np.testing.assert_array_equal(np.asarray(unpack_table(p, 37)), np.asarray(t))


def test_packed_lookup_sorted_matches_take(rng):
    t = jnp.asarray(rng.randn(100, 16).astype(np.float32))
    p = pack_table(t)
    idx = np.sort(rng.randint(0, 100, size=64)).astype(np.int32)
    got = np.asarray(packed_lookup_sorted(p, jnp.asarray(idx)))
    np.testing.assert_allclose(got, np.asarray(t)[idx], rtol=1e-6)


def test_aggregate_updates_compacts_unique_rows(rng):
    idx_s = jnp.asarray(np.array([0, 2, 2, 5, 5, 5, 9], np.int32))
    g = jnp.asarray(rng.randn(7, 16).astype(np.float32))
    rows, seg = aggregate_updates(idx_s, g, 1 << 30)
    rows, seg = np.asarray(rows), np.asarray(seg)
    gn = np.asarray(g)
    # unique rows first, sorted; tail is sentinel
    np.testing.assert_array_equal(rows[:4], [0, 2, 5, 9])
    assert (rows[4:] == 1 << 30).all()
    np.testing.assert_allclose(seg[0], gn[0], rtol=1e-6)
    np.testing.assert_allclose(seg[1], gn[1] + gn[2], rtol=1e-5)
    np.testing.assert_allclose(seg[2], gn[3] + gn[4] + gn[5], rtol=1e-5)
    np.testing.assert_allclose(seg[3], gn[6], rtol=1e-6)
    np.testing.assert_array_equal(seg[4:], 0)


@pytest.mark.parametrize("vocab,n", [(1000, 256), (64, 256), (5000, 64)])
def test_sweep_kernel_matches_reference(rng, vocab, n):
    """Pallas sweep (interpret) == scatter reference == flat-table adagrad,
    across vocab/update densities (duplicates, multi-chunk tiles)."""
    from nasrec_tpu.train.sparse_embedding import (
        rowwise_segment_sum,
        sparse_adagrad_table_update,
    )

    t16 = jnp.asarray(rng.randn(vocab, 16).astype(np.float32))
    a16 = jnp.asarray((rng.rand(vocab, 16) * 0.1).astype(np.float32))
    idx = np.sort(rng.randint(0, vocab, size=n)).astype(np.int32)
    g = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    lr = 0.07

    rows_c, seg_c = aggregate_updates(jnp.asarray(idx), g, 1 << 30)
    tp, ap = pack_table(t16), pack_table(a16)

    # small K/C force multiple tiles and multi-chunk segments
    # (the kernel donates table/acc, so pass copies)
    new_tp, new_ap = sweep_adagrad_update(
        jnp.array(tp), jnp.array(ap), rows_c, seg_c, lr,
        K=8, C=16, eps=1e-2, interpret=True,
    )
    ref_tp, ref_ap = sweep_adagrad_update_reference(
        tp, ap, rows_c, seg_c, lr, eps=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(new_tp), np.asarray(ref_tp), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_ap), np.asarray(ref_ap), rtol=1e-5, atol=1e-6
    )

    # and both equal the flat [T,16] sparse-adagrad update
    r, seg, is_end = rowwise_segment_sum(jnp.asarray(idx), g)
    flat_t, flat_a = sparse_adagrad_table_update(
        t16, a16, r, seg, lr, 1e-2, 1.0, is_end
    )
    np.testing.assert_allclose(
        np.asarray(unpack_table(new_tp, vocab)), np.asarray(flat_t),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(unpack_table(new_ap, vocab)), np.asarray(flat_a),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_packed_step_matches_flat_sparse_step(impl):
    """Full packed train step == the flat sparse step, several steps deep
    (vocab=8 forces heavy duplicates)."""
    choice = get_best_arch("criteo-kaggle", "autoctr")
    vocab = tuple([8] * 26)
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, vocab, use_layernorm=False
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    offsets = table_offsets(vocab)
    sched = lambda s: jnp.asarray(0.1)
    batches = list(synthetic_batches(48, 16, SyntheticSpec(vocab=8), seed=0))

    state1 = init_train_state(params, opt)
    step1 = make_sparse_embedding_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
        opt, sched, offsets, donate=False,
    )
    for d, c, y in batches:
        state1, m1 = step1(state1, d, c, y)

    state2 = init_train_state(pack_embedding_params(params), opt)
    step2 = make_packed_sparse_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
        opt, sched, offsets, donate=False,
        impl=impl, interpret=(impl == "pallas"),
    )
    for d, c, y in batches:
        state2, m2 = step2(state2, d, c, y)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    total = sum(vocab)
    np.testing.assert_allclose(
        np.asarray(unpack_table(state2.params["embedding"]["table"], total)),
        np.asarray(state1.params["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(unpack_table(state2.opt_state["embedding"]["table"], total)),
        np.asarray(state1.opt_state["embedding"]["table"]),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(state2.params["final"]["w"]),
        np.asarray(state1.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
