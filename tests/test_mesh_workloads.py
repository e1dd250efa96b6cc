"""Round-2 integration tests: mesh-mode workloads (dp+tp reachable from the
public API), the sharded sparse-adagrad step, host-offloaded workloads, bf16
compute, the wired --test_limit, use_final_sigmoid, and the pinned
freeze_mask leaf sets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.parallel import (
    make_mesh,
    make_parallel_sparse_train_step,
    pad_table_for_sharding,
    shard_train_state,
)
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.sparse_embedding import make_sparse_embedding_train_step
from nasrec_tpu.workloads import (
    DataOptions,
    SupernetOptions,
    TrainOptions,
    _max_eval_steps,
    train_fixed_subnet,
    train_supernet,
)


requires_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _data(bs=128, test_bs=256):
    return DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        train_batch_size=bs, test_batch_size=test_bs,
        synthetic_train_examples=2048, synthetic_test_examples=512,
    )


def _train(steps=6, **kw):
    return TrainOptions(
        learning_rate=0.05, display_interval=steps, test_interval=steps,
        max_train_steps=steps, max_eval_steps=2, **kw,
    )


# ---------------------------------------------------------------------------
# Sharded sparse-adagrad step numerics
# ---------------------------------------------------------------------------


@requires_8dev
def test_parallel_sparse_step_matches_single_device(rng):
    """dp=2 x tp=4 sparse (touched-rows) step == single-device sparse step."""
    mesh = make_mesh(model=4, data=2)
    choice = get_best_arch("criteo-kaggle", "autoctr")
    vocab = tuple([37] * 26)  # 962 rows: NOT divisible by 4 -> exercises padding
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, vocab, use_layernorm=False
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    offsets = table_offsets(vocab)
    sched = lambda s: jnp.asarray(0.1)
    batches = list(synthetic_batches(32, 16, SyntheticSpec(vocab=37), seed=0))

    # single device
    state1 = init_train_state(params, opt)
    step1 = make_sparse_embedding_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
        opt, sched, offsets, donate=False,
    )
    for d, c, y in batches:
        state1, m1 = step1(state1, d, c, y)

    # dp=2 x tp=4, sharded table + touched-rows update
    params_sh = dict(params)
    params_sh["embedding"] = pad_table_for_sharding(params["embedding"], 4)
    state8 = shard_train_state(init_train_state(params_sh, opt), mesh)
    step8 = make_parallel_sparse_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
        opt, sched, mesh, offsets, donate=False,
    )
    for d, c, y in batches:
        state8, m8 = step8(state8, d, c, y)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    rows = state1.params["embedding"]["table"].shape[0]
    np.testing.assert_allclose(
        np.asarray(state8.params["embedding"]["table"])[:rows],
        np.asarray(state1.params["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state8.opt_state["embedding"]["table"])[:rows],
        np.asarray(state1.opt_state["embedding"]["table"]),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(state8.params["final"]["w"]),
        np.asarray(state1.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
    # padding rows were never touched
    pad = np.asarray(state8.params["embedding"]["table"])[rows:]
    np.testing.assert_array_equal(pad, np.zeros_like(pad))


@requires_8dev
def test_parallel_sparse_sweep_step_matches_single_device(rng):
    """dp=4 x tp=2 SWEEP-update step == single-device scatter sparse step
    (same batches, same model): the per-shard streaming sweep with
    row_offset reproduces exact torch-adagrad semantics under sharding."""
    from nasrec_tpu.parallel import pack_table_for_mesh, unpack_table_from_mesh

    mesh = make_mesh(model=2, data=4)
    choice = get_best_arch("criteo-kaggle", "autoctr")
    vocab = tuple([37] * 26)  # 962 rows -> 2 shards x 16384 rows (1 tile each)
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, vocab, use_layernorm=False
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    offsets = table_offsets(vocab)
    sched = lambda s: jnp.asarray(0.1)
    batches = list(synthetic_batches(32, 16, SyntheticSpec(vocab=37), seed=0))

    state1 = init_train_state(params, opt)
    step1 = make_sparse_embedding_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
        opt, sched, offsets, donate=False,
    )
    for d, c, y in batches:
        state1, m1 = step1(state1, d, c, y)

    params_sw = dict(params)
    params_sw["embedding"] = {
        **params["embedding"],
        "table": pack_table_for_mesh(params["embedding"]["table"], 2),
    }
    state8 = shard_train_state(init_train_state(params_sw, opt), mesh)
    step8 = make_parallel_sparse_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
        opt, sched, mesh, offsets, donate=False, table_update="sweep",
    )
    for d, c, y in batches:
        state8, m8 = step8(state8, d, c, y)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    rows = state1.params["embedding"]["table"].shape[0]
    got_table = unpack_table_from_mesh(
        state8.params["embedding"]["table"], rows, 2
    )
    got_acc = unpack_table_from_mesh(
        state8.opt_state["embedding"]["table"], rows, 2
    )
    np.testing.assert_allclose(
        np.asarray(got_table), np.asarray(state1.params["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got_acc), np.asarray(state1.opt_state["embedding"]["table"]),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(state8.params["final"]["w"]),
        np.asarray(state1.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# Mesh-mode workloads (the --mesh_model path)
# ---------------------------------------------------------------------------


@requires_8dev
def test_train_fixed_subnet_mesh(tmp_path):
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    out = train_fixed_subnet(
        payload, _data(),
        _train(mesh_model=4, logging_dir=str(tmp_path)),
        log_fn=lambda s: None,
    )
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])
    # checkpoint table is unpadded (26 * 1000 synthetic rows exactly)
    import pickle

    with open(tmp_path / "checkpoint.pkl", "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["params"]["embedding"]["table"].shape[0] == 26 * 1000


@requires_8dev
def test_train_fixed_subnet_mesh_sweep(tmp_path):
    """--mesh_model 2 --table_update sweep end-to-end: trains, evals through
    the packed sharded lookup, and saves a standard-layout checkpoint."""
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    out = train_fixed_subnet(
        payload, _data(),
        _train(mesh_model=2, table_update="sweep", logging_dir=str(tmp_path)),
        log_fn=lambda s: None,
    )
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])
    import pickle

    with open(tmp_path / "checkpoint.pkl", "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["params"]["embedding"]["table"].shape == (26 * 1000, 16)


@requires_8dev
def test_train_supernet_mesh():
    sn = SupernetOptions(config="autoctr", num_blocks=2, supernet_training_steps=2)
    out = train_supernet(
        sn, _data(), _train(steps=6, mesh_model=2), log_fn=lambda s: None
    )
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])
    assert int(out["state"].step) == 6


@requires_8dev
def test_cli_main_train_mesh(tmp_path):
    from nasrec_tpu.cli.main_train import main

    main([
        "--net", "supernet-config", "--arch", "criteo-kaggle/autoctr",
        "--data_source", "synthetic", "--max_train_steps", "4",
        "--max_eval_steps", "2", "--test_interval", "4",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--mesh_model", "4", "--logging_dir", str(tmp_path / "run"),
    ])
    assert (tmp_path / "run" / "checkpoint.pkl").exists()


# ---------------------------------------------------------------------------
# Host-offloaded embedding reachable from the workloads
# ---------------------------------------------------------------------------


def test_train_fixed_subnet_host_offload(tmp_path):
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    out = train_fixed_subnet(
        payload, _data(),
        _train(place_embedding_on_cpu=True, logging_dir=str(tmp_path)),
        log_fn=lambda s: None,
    )
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])
    import pickle

    with open(tmp_path / "checkpoint.pkl", "rb") as f:
        ckpt = pickle.load(f)
    # the host table is saved back into the checkpoint
    assert ckpt["params"]["embedding"]["table"].shape == (26 * 1000, 16)


def test_train_supernet_host_offload():
    sn = SupernetOptions(config="autoctr", num_blocks=2, supernet_training_steps=2)
    out = train_supernet(
        sn, _data(), _train(steps=4, place_embedding_on_cpu=True),
        log_fn=lambda s: None,
    )
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])


# ---------------------------------------------------------------------------
# bf16 compute, test_limit, use_final_sigmoid
# ---------------------------------------------------------------------------


def test_train_fixed_subnet_bf16():
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    out = train_fixed_subnet(
        payload, _data(), _train(compute_dtype="bfloat16"), log_fn=lambda s: None
    )
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])
    # bf16 training tracks the f32 run loosely (same data, same seed)
    out32 = train_fixed_subnet(
        payload, _data(), _train(), log_fn=lambda s: None
    )
    assert logs["test_loss"][-1] == pytest.approx(
        out32["logs"][0]["test_loss"][-1], abs=0.05
    )


def test_bf16_model_body_runs_in_bf16():
    """The compute_dtype plumbing really lowers block math to bf16."""
    from nasrec_tpu.models import fixed_apply

    choice = get_best_arch("criteo-kaggle", "autoctr")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, tuple([50] * 26)
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    d = jnp.zeros((4, 13)); c = jnp.zeros((4, 26), jnp.int32)
    f32 = fixed_apply(plan, params, d, c)
    bf16 = fixed_apply(plan, params, d, c, compute_dtype=jnp.bfloat16)
    assert f32.dtype == jnp.float32 and bf16.dtype == jnp.float32  # logits f32
    txt = str(jax.jit(
        lambda p, d, c: fixed_apply(plan, p, d, c, compute_dtype=jnp.bfloat16)
    ).lower(params, d, c).as_text())
    assert "bf16" in txt


def test_test_limit_derives_eval_cap():
    data = _data(test_bs=128)
    t = TrainOptions(max_eval_steps=-1, test_limit=300)
    assert _max_eval_steps(data, t) == 3  # ceil(300/128)
    t2 = TrainOptions(max_eval_steps=5, test_limit=300)
    assert _max_eval_steps(data, t2) == 5  # explicit batch cap wins
    t3 = TrainOptions()
    assert _max_eval_steps(data, t3) == -1


def test_use_final_sigmoid_output_in_unit_interval():
    from nasrec_tpu.models import fixed_apply

    choice = get_best_arch("criteo-kaggle", "autoctr")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, tuple([50] * 26),
        use_final_sigmoid=True,
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    out = fixed_apply(
        plan, params, jnp.ones((8, 13)), jnp.zeros((8, 26), jnp.int32)
    )
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


# ---------------------------------------------------------------------------
# First-class Orbax checkpoints: save from a mesh run, resume into a mesh
# ---------------------------------------------------------------------------


@requires_8dev
def test_supernet_orbax_checkpoint_resume_on_mesh(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    sn = SupernetOptions(config="autoctr", num_blocks=2, supernet_training_steps=2)
    train_supernet(
        sn, _data(),
        _train(steps=4, mesh_model=2, ckpt_backend="orbax",
               logging_dir=str(tmp_path)),
        log_fn=lambda s: None,
    )
    ckpt_dir = tmp_path / "supernet_checkpoint.orbax"
    assert ckpt_dir.is_dir()
    sn2 = SupernetOptions(
        config="autoctr", num_blocks=2, supernet_training_steps=2,
        checkpoint_path=str(ckpt_dir),
    )
    out2 = train_supernet(
        sn2, _data(), _train(steps=3, mesh_model=2), log_fn=lambda s: None
    )
    assert int(out2["state"].step) == 4 + 3
    logs = out2["logs"][0]
    assert np.isfinite(logs["test_loss"][-1])


def test_orbax_pickle_payload_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from nasrec_tpu.train.checkpoint import load_any_checkpoint, save_checkpoint_any

    payload = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": 17,
        "supernet": {"config": "autoctr", "use_layernorm": True},
    }
    p_orbax = tmp_path / "ck.orbax"
    save_checkpoint_any(str(p_orbax), payload, "orbax")
    got = load_any_checkpoint(str(p_orbax))
    np.testing.assert_array_equal(got["params"]["w"], payload["params"]["w"])
    assert int(np.asarray(got["step"])) == 17
    assert got["supernet"]["config"] == "autoctr"
    p_pkl = tmp_path / "ck.pkl"
    save_checkpoint_any(str(p_pkl), payload, "pickle")
    got2 = load_any_checkpoint(str(p_pkl))
    assert int(got2["step"]) == 17


@requires_8dev
def test_parallel_sparse_microbatch_matches_full_batch(rng):
    """Mesh step with microbatch=2 == mesh step full-batch (gradient
    accumulation semantics: mean of slice grads == full-batch grad)."""
    mesh = make_mesh(model=2, data=4)
    choice = get_best_arch("criteo-kaggle", "autoctr")
    vocab = tuple([37] * 26)
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, vocab, use_layernorm=False
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    offsets = table_offsets(vocab)
    sched = lambda s: jnp.asarray(0.1)
    batches = list(synthetic_batches(32, 16, SyntheticSpec(vocab=37), seed=0))

    def run(micro):
        params_sh = dict(params)
        params_sh["embedding"] = pad_table_for_sharding(params["embedding"], 2)
        state = shard_train_state(init_train_state(params_sh, opt), mesh)
        step = make_parallel_sparse_train_step(
            lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
            opt, sched, mesh, offsets, donate=False, microbatch=micro,
        )
        m = None
        for d, c, y in batches:
            state, m = step(state, d, c, y)
        return state, m

    s1, m1 = run(1)
    s2, m2 = run(2)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2.params["embedding"]["table"]),
        np.asarray(s1.params["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s2.params["final"]["w"]),
        np.asarray(s1.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
