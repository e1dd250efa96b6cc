"""Misc completeness tests: choice enumeration, metrics writer, sharded ckpt."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.choices import (
    enumerate_macro_choices,
    enumerate_micro_choices,
    get_all_subnet_choices,
)


def test_enumerate_macro_choices():
    c = enumerate_macro_choices(1)  # 2 prior outputs
    assert set(c["dense_idx"]) == {(0,), (1,), (0, 1)}
    assert set(c["dense_left_idx"]) == {(0,), (1,)}


def test_enumerate_micro_choices():
    space = OPS_CONFIG_LIB["xlarge"]
    c = enumerate_micro_choices(space)
    assert len(c["active_nodes"]) == len(space.dense_nodes) * len(space.sparse_nodes)
    assert c["dense_sparse_interact"] == [0, 1]


def test_get_all_subnet_choices_structure():
    all_c = get_all_subnet_choices(OPS_CONFIG_LIB["autoctr"], 3)
    assert len(all_c["macro"]) == 3 and len(all_c["micro"]) == 3


def test_metrics_writer_jsonl(tmp_path):
    from nasrec_tpu.train.logging import MetricsWriter

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.scalar("Loss/train", 0.5, 10)
    w.scalar("Loss/test", 0.4, 20)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["tag"] == "Loss/train" and lines[0]["value"] == 0.5
    assert lines[1]["step"] == 20


def test_sharded_checkpoint_roundtrip(tmp_path):
    from nasrec_tpu.parallel.distributed import (
        load_sharded_checkpoint,
        save_sharded_checkpoint,
    )
    from nasrec_tpu.train.loop import TrainState

    params = {
        "embedding": {"table": jnp.arange(32.0).reshape(8, 4)},
        "final": {"w": jnp.ones((3, 1))},
    }
    opt = {
        "embedding": {"table": jnp.ones((8, 4))},
        "final": {"w": jnp.zeros((3, 1))},
    }
    state = TrainState(params, opt, jnp.asarray(42, jnp.int32))
    save_sharded_checkpoint(str(tmp_path), state, extra={"note": "x"})
    loaded = load_sharded_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(
        loaded["params"]["embedding"]["table"], np.asarray(params["embedding"]["table"])
    )
    np.testing.assert_array_equal(
        loaded["opt_state"]["embedding"]["table"], np.ones((8, 4))
    )
    assert loaded["step"] == 42 and loaded["extra"]["note"] == "x"


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from nasrec_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7, jnp.int32)}
    path = str(tmp_path / "ckpt")
    save_checkpoint_orbax(path, tree)
    loaded = load_checkpoint_orbax(path, tree)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(loaded["step"]) == 7


def test_dot_flops_counts_matmuls_exactly():
    """jaxpr-based dot counting: fwd 2MNK per layer; grad adds dW and dx
    matmuls (dx of the first layer included since x is an argument)."""
    import jax
    import jax.numpy as jnp
    from nasrec_tpu.profiling import dot_flops

    def f(x, w1, w2):
        return jnp.tanh(x @ w1) @ w2

    x = jnp.ones((64, 128))
    w1 = jnp.ones((128, 256))
    w2 = jnp.ones((256, 32))
    fwd = 2 * 64 * 128 * 256 + 2 * 64 * 256 * 32
    assert dot_flops(f, x, w1, w2) == fwd
    g = jax.grad(lambda x, w1, w2: f(x, w1, w2).sum(), argnums=(1, 2))
    assert dot_flops(g, x, w1, w2) == 3 * fwd - 2 * 64 * 128 * 256

    # Recurses through jit boundaries.
    assert dot_flops(jax.jit(f), x, w1, w2) == fwd

    # A scan body's dots count once per iteration (micro-batched grad
    # accumulation would otherwise under-report by the slice count).
    def scanned(x, w1, w2):
        def body(c, xs):
            return c, f(xs, w1, w2)
        return jax.lax.scan(body, 0.0, x.reshape(4, 16, 128))[1]

    assert dot_flops(scanned, x, w1, w2) == fwd
