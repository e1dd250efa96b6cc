"""Multi-device tests on the virtual 8-device CPU mesh: sharded embedding
lookup correctness and dp+tp train-step equivalence with single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_apply, fixed_init
from nasrec_tpu.models.embedding import embedding_stem_apply, table_offsets
from nasrec_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    make_sharded_stem_lookup,
    pad_table_for_sharding,
    param_shardings,
    shard_train_state,
)
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches
from nasrec_tpu.train import make_optimizer, make_train_step
from nasrec_tpu.train.loop import init_train_state


requires_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@requires_8dev
def test_sharded_lookup_matches_dense(rng):
    mesh = make_mesh(model=4, data=2)
    vocab_sizes = (97, 53, 211)
    key = jax.random.PRNGKey(0)
    from nasrec_tpu.models.embedding import embedding_stem_init

    params = embedding_stem_init(key, vocab_sizes, 16)
    offsets = table_offsets(vocab_sizes)
    cat = rng.randint(0, 50, size=(8, 3)).astype(np.int32)

    want = np.asarray(embedding_stem_apply(params, jnp.asarray(cat), offsets))

    sharded_params = pad_table_for_sharding(params, 4)
    lookup = make_sharded_stem_lookup(mesh)
    got = np.asarray(
        jax.jit(lambda p, c: lookup(p, c, offsets))(sharded_params, jnp.asarray(cat))
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@requires_8dev
def test_sharded_lookup_gradients_match(rng):
    mesh = make_mesh(model=4, data=2)
    vocab_sizes = (64, 32)
    from nasrec_tpu.models.embedding import embedding_stem_init

    params = embedding_stem_init(jax.random.PRNGKey(1), vocab_sizes, 8)
    offsets = table_offsets(vocab_sizes)
    cat = rng.randint(0, 30, size=(16, 2)).astype(np.int32)

    def loss_dense(p):
        return jnp.sum(embedding_stem_apply(p, jnp.asarray(cat), offsets) ** 2)

    g_dense = jax.grad(loss_dense)(params)["table"]

    lookup = make_sharded_stem_lookup(mesh)
    sp = pad_table_for_sharding(params, 4)

    def loss_sharded(p):
        return jnp.sum(lookup(p, jnp.asarray(cat), offsets) ** 2)

    g_sharded = jax.jit(jax.grad(loss_sharded))(sp)["table"]
    np.testing.assert_allclose(
        np.asarray(g_sharded)[: g_dense.shape[0]], np.asarray(g_dense),
        rtol=1e-5, atol=1e-6,
    )


@requires_8dev
def test_parallel_train_step_matches_single_device(rng):
    """dp=2 x tp=4 step must reproduce the single-device step numerically."""
    mesh = make_mesh(model=4, data=2)
    choice = get_best_arch("criteo-kaggle", "xlarge")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["xlarge"], 7, 13, 26, tuple([64] * 26),
        use_layernorm=False,
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    spec = SyntheticSpec(vocab=64)
    d, c, y = next(synthetic_batches(16, 16, spec))

    # single device
    state1 = init_train_state(params, opt)
    step1 = make_train_step(
        lambda p, dd, cc: fixed_apply(plan, p, dd, cc), opt,
        lambda s: jnp.asarray(0.1), donate=False,
    )
    state1, m1 = step1(state1, d, c, y)

    # dp+tp
    lookup = make_sharded_stem_lookup(mesh)
    params_sh = dict(params)
    params_sh["embedding"] = pad_table_for_sharding(params["embedding"], 4)
    state8 = shard_train_state(init_train_state(params_sh, opt), mesh)
    step8 = make_parallel_train_step(
        lambda p, dd, cc: fixed_apply(plan, p, dd, cc, stem_lookup=lookup),
        opt, lambda s: jnp.asarray(0.1), mesh, donate=False,
    )
    state8, m8 = step8(state8, d, c, y)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(state8.params["final"]["w"]),
        np.asarray(state1.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
    rows = state1.params["embedding"]["table"].shape[0]
    np.testing.assert_allclose(
        np.asarray(state8.params["embedding"]["table"])[:rows],
        np.asarray(state1.params["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )


@requires_8dev
def test_param_shardings_table_on_model_axis():
    mesh = make_mesh(model=2, data=4)
    params = {
        "embedding": {"table": jnp.zeros((16, 4))},
        "final": {"w": jnp.zeros((3, 1))},
    }
    sh = param_shardings(params, mesh)
    assert sh["embedding"]["table"].spec == jax.sharding.PartitionSpec("model", None)
    assert sh["final"]["w"].spec == jax.sharding.PartitionSpec()
