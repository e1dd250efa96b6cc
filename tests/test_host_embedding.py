"""Host-offloaded embedding training must match on-device training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_apply, fixed_init
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.parallel.host_embedding import HostEmbedding, make_host_offload_train_step
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches
from nasrec_tpu.train import make_optimizer, make_train_step
from nasrec_tpu.train.loop import init_train_state


def _plan():
    choice = get_best_arch("criteo-kaggle", "autoctr")
    return build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, tuple([64] * 26),
        use_layernorm=False,
    )


@pytest.mark.parametrize("clip", [5.0, 0.05])
def test_host_offload_matches_device_training(clip):
    """Same batches, same updates — including exact global-norm clipping that
    sees scatter-added per-row embedding grads (duplicate indices)."""
    plan = _plan()
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    lr = lambda s: jnp.asarray(0.1)
    spec = SyntheticSpec(vocab=64)
    batches = list(synthetic_batches(4 * 32, 32, spec, seed=0))

    # On-device reference run.
    state_dev = init_train_state(params, opt)
    step_dev = make_train_step(
        lambda p, d, c: fixed_apply(plan, p, d, c), opt, lr,
        grad_clip=clip, donate=False,
    )
    for d, c, y in batches:
        state_dev, m_dev = step_dev(state_dev, d, c, y)

    # Host-offloaded run: table + its adagrad state live in host numpy.
    offsets = table_offsets(plan.vocab_sizes)
    host_emb = HostEmbedding(np.asarray(params["embedding"]["table"]), offsets)
    dev_params = {k: v for k, v in params.items() if k != "embedding"}
    state_off = init_train_state(dev_params, opt)
    step_off = make_host_offload_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s), opt, lr, host_emb,
        grad_clip=clip,
    )
    for d, c, y in batches:
        state_off, m_off = step_off(state_off, d, c, y)

    assert float(m_dev["loss"]) == pytest.approx(float(m_off["loss"]), rel=1e-4)
    np.testing.assert_allclose(
        host_emb.table, np.asarray(state_dev.params["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state_off.params["final"]["w"]),
        np.asarray(state_dev.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_load_embedding_from_checkpoint(tmp_path):
    from nasrec_tpu.models.embedding import load_embedding_from_checkpoint
    from nasrec_tpu.train import save_checkpoint

    plan = _plan()
    donor = fixed_init(jax.random.PRNGKey(7), plan)
    save_checkpoint(str(tmp_path / "donor.pkl"), {"params": donor})
    target = fixed_init(jax.random.PRNGKey(8), plan)
    seeded = load_embedding_from_checkpoint(target, str(tmp_path / "donor.pkl"))
    np.testing.assert_array_equal(
        np.asarray(seeded["embedding"]["table"]),
        np.asarray(donor["embedding"]["table"]),
    )
    # non-embedding params untouched
    np.testing.assert_array_equal(
        np.asarray(seeded["final"]["w"]), np.asarray(target["final"]["w"])
    )


def test_host_offload_l2_term_over_device_params():
    """l2_reg adds the explicit L2 loss over the device-resident params
    (the table is excluded, as in the on-device sparse step); metrics split
    it out the same way ({"loss": bce, "l2": penalty})."""
    from nasrec_tpu.train.optim import l2_penalty

    plan = _plan()
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    lr = lambda s: jnp.asarray(0.1)
    spec = SyntheticSpec(vocab=64)
    d, c, y = next(iter(synthetic_batches(32, 32, spec, seed=0)))

    offsets = table_offsets(plan.vocab_sizes)
    host_emb = HostEmbedding(np.asarray(params["embedding"]["table"]), offsets)
    dev_params = {k: v for k, v in params.items() if k != "embedding"}
    state = init_train_state(dev_params, opt)
    step = make_host_offload_train_step(
        lambda p, d_, s: fixed_apply_embedded(plan, p, d_, s), opt, lr,
        host_emb, grad_clip=5.0, l2_reg=1e-3,
    )
    _, m = step(state, d, c, y)
    expect = float(l2_penalty(dev_params, 1e-3))
    assert float(m["l2"]) == pytest.approx(expect, rel=1e-5)
    assert float(m["loss"]) > 0.0
