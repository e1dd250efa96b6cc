"""Streaming-sweep adagrad table update (Pallas) vs the scatter path.

The sweep kernel (ops/kernels/table_sweep_pallas.py) operates on the PACKED
[Tpad/8, 128] table layout and must reproduce the touched-row scatter update
exactly (up to FMA contraction, <= 1 ulp) for uniform, duplicate-heavy, and
skewed (window-overflow) traffic, and pass untouched rows through bit-exactly.
Runs the Pallas interpreter on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches
from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.sparse_embedding import (
    make_sparse_embedding_train_step,
    pack_state_for_sweep,
    rowwise_segment_sum,
    unpack_state_from_sweep,
)


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.randn(1000, 16), jnp.float32)
    p = tsp.pack_rows(x)
    assert p.shape == (tsp.sweep_padded_rows(1000) // tsp.GROUP, tsp.LANES)
    np.testing.assert_array_equal(np.asarray(tsp.unpack_rows(p, 1000)),
                                  np.asarray(x))
    # vocab row 8p+j lands at packed[p, 16j:16j+16]
    np.testing.assert_array_equal(np.asarray(p[3, 32:48]), np.asarray(x[26]))


def test_packed_lookup_matches_take(rng):
    x = jnp.asarray(rng.randn(500, 16), jnp.float32)
    p = tsp.pack_rows(x)
    idx = jnp.asarray(rng.randint(0, 500, size=777), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(tsp.packed_lookup(p, idx)),
        np.asarray(jnp.take(x, idx, axis=0)),
    )


def _run_case(idx, tpad_rows, lr=0.12, seed=0):
    """idx: vocab rows.  Returns packed (new, ref) tables/accs + touched
    super-row mask."""
    rng = np.random.RandomState(seed)
    n = len(idx)
    g = rng.randn(n, 16).astype(np.float32)
    rows, seg16, is_end = rowwise_segment_sum(
        jnp.asarray(idx, jnp.int32), jnp.asarray(g)
    )
    tp = tpad_rows // tsp.GROUP
    table_p = jnp.asarray(rng.randn(tp, tsp.LANES), jnp.float32)
    acc_p = jnp.abs(jnp.asarray(rng.randn(tp, tsp.LANES), jnp.float32))
    ref_t, ref_a = tsp.sweep_adagrad_update_reference(
        table_p, acc_p, rows, seg16, lr
    )
    new_t, new_a = tsp.sweep_adagrad_update(
        table_p, acc_p, rows, seg16, lr, interpret=True
    )
    touched = np.zeros(tp, bool)
    touched[np.unique(np.asarray(idx) // tsp.GROUP)] = True
    return tuple(map(np.asarray, (new_t, new_a, ref_t, ref_a))), touched


def _assert_match(arrs, touched):
    new_t, new_a, ref_t, ref_a = arrs
    # untouched super-rows: bit-exact pass-through
    np.testing.assert_array_equal(new_t[~touched], ref_t[~touched])
    np.testing.assert_array_equal(new_a[~touched], ref_a[~touched])
    # touched super-rows: exact up to FMA contraction
    np.testing.assert_allclose(new_t[touched], ref_t[touched],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(new_a[touched], ref_a[touched],
                               rtol=1e-5, atol=1e-6)


def test_sweep_uniform_with_duplicates(rng):
    """Uniform traffic with duplicates (the segment-sum contract: sorted
    super-rows, zero seg off segment ends) across several tiles."""
    tpad = 3 * tsp.ROWS_PER_TILE
    idx = rng.randint(0, tpad - 100, size=2000)
    arrs, touched = _run_case(idx, tpad)
    assert touched.sum() > 0.6 * len(idx)  # mostly unique super-rows
    _assert_match(arrs, touched)


def test_sweep_two_rows_one_superrow(rng):
    """Distinct vocab rows sharing a packed super-row must update their own
    lane groups independently."""
    tpad = tsp.ROWS_PER_TILE
    idx = np.array([40, 41, 47, 40, 1000, 1001], np.int32)
    arrs, touched = _run_case(idx, tpad)
    assert touched.sum() == 2  # super-rows 5 and 125
    _assert_match(arrs, touched)


def test_sweep_heavy_skew_one_tile(rng):
    """Far more update positions inside one tile than one window holds: the
    window-linearized schedule must give that tile many consecutive steps
    (the CTR small-table case that breaks fixed windows-per-tile)."""
    tpad = 2 * tsp.ROWS_PER_TILE
    # Several windows' worth of unique super-rows in tile 0 (a window holds
    # CW positions)
    nsk = tsp.K_TILE - 100
    assert nsk > 3 * tsp.CW
    sup = rng.choice(tsp.K_TILE, size=nsk, replace=False)
    idx = sup * tsp.GROUP + rng.randint(0, tsp.GROUP, size=nsk)
    arrs, touched = _run_case(idx, tpad)
    assert touched.sum() == nsk
    _assert_match(arrs, touched)


def test_sweep_skewed_hot_row(rng):
    """One hot row with thousands of zero-seg duplicate positions (zipf-like
    CTR traffic) must be exact: the duplicates span many windows of one tile
    and contribute exact zeros everywhere but the segment end."""
    tpad = 2 * tsp.ROWS_PER_TILE
    hot = np.full(5000, 7, np.int32)
    cold = rng.randint(0, tpad, size=500)
    idx = np.concatenate([hot, cold])
    arrs, touched = _run_case(idx, tpad)
    _assert_match(arrs, touched)


def test_sweep_all_sentinel_rows():
    """Every row out of bounds (a shard owning no touched rows): zero
    active steps; table/acc must pass through bit-exactly (the forced
    step-0 copy-through guards the end-of-grid flush)."""
    tp = 2 * tsp.K_TILE
    rows = jnp.full((64,), tp * tsp.GROUP + 5, jnp.int32)
    seg = jnp.asarray(np.random.RandomState(1).randn(64, tsp.EMB), jnp.float32)
    table = jnp.asarray(np.random.RandomState(2).randn(tp, tsp.LANES), jnp.float32)
    acc = jnp.abs(table) + 0.25
    table_np, acc_np = np.asarray(table), np.asarray(acc)
    new_t, new_a = tsp.sweep_adagrad_update(table, acc, rows, seg, 0.1,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(new_t), table_np)
    np.testing.assert_array_equal(np.asarray(new_a), acc_np)


def test_sweep_untouched_tiles_skipped_bit_exact(rng):
    """Updates confined to the middle tile of three: the schedule gives the
    outer tiles zero grid steps, and their blocks must pass through
    bit-exactly via the input/output alias (no DMA at all)."""
    tpad = 3 * tsp.ROWS_PER_TILE
    idx = tsp.ROWS_PER_TILE + rng.randint(0, tsp.ROWS_PER_TILE, size=900)
    arrs, touched = _run_case(idx, tpad)
    assert not touched[: tsp.K_TILE].any()
    assert not touched[2 * tsp.K_TILE:].any()
    _assert_match(arrs, touched)


def test_sweep_empty_update():
    """All-zero gradients: table/acc unchanged bit-exactly."""
    tp = tsp.K_TILE
    rows = jnp.asarray(np.arange(100, dtype=np.int32))
    seg = jnp.zeros((100, tsp.EMB), jnp.float32)
    table = jnp.asarray(
        np.random.RandomState(0).randn(tp, tsp.LANES), jnp.float32
    )
    acc = jnp.abs(table) + 0.5
    table_np, acc_np = np.asarray(table), np.asarray(acc)  # donated below
    new_t, new_a = tsp.sweep_adagrad_update(table, acc, rows, seg, 0.1,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(new_t), table_np)
    np.testing.assert_array_equal(np.asarray(new_a), acc_np)


def test_sweep_step_matches_scatter_step():
    """End-to-end: the sweep-update train step (packed state) tracks the
    scatter-update step over several batches (same model)."""
    choice = get_best_arch("criteo-kaggle", "autoctr")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, tuple([8] * 26),
        use_layernorm=False,
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    lr = lambda s: jnp.asarray(0.1)
    spec = SyntheticSpec(vocab=8)
    batches = list(synthetic_batches(3 * 64, 64, spec, seed=0))

    mk = lambda upd: make_sparse_embedding_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s), opt, lr,
        table_offsets(plan.vocab_sizes), grad_clip=5.0, donate=False,
        table_update=upd,
    )
    total_vocab = 26 * 8
    state_sc = init_train_state(params, opt)
    state_sw = pack_state_for_sweep(state_sc)
    assert (
        state_sw.params["embedding"]["table"].shape[0] % tsp.K_TILE == 0
    )
    step_sc, step_sw = mk("scatter"), mk("sweep")
    for d, c, y in batches:
        state_sc, m_sc = step_sc(state_sc, d, c, y)
        state_sw, m_sw = step_sw(state_sw, d, c, y)

    assert float(m_sc["loss"]) == pytest.approx(float(m_sw["loss"]), rel=1e-5)
    unpacked = unpack_state_from_sweep(state_sw, total_vocab)
    np.testing.assert_allclose(
        np.asarray(unpacked.params["embedding"]["table"]),
        np.asarray(state_sc.params["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(unpacked.opt_state["embedding"]["table"]),
        np.asarray(state_sc.opt_state["embedding"]["table"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state_sw.params["final"]["w"]),
        np.asarray(state_sc.params["final"]["w"]),
        rtol=1e-4, atol=1e-6,
    )
    # padding rows of the packed sweep state never move
    packed = np.asarray(state_sw.params["embedding"]["table"])
    n_sup = -(-total_vocab // tsp.GROUP)
    lane = n_sup * tsp.GROUP - total_vocab  # rows 208..: all-zero lanes
    assert lane == 0
    np.testing.assert_array_equal(packed[n_sup:], np.zeros_like(packed[n_sup:]))


def test_sweep_requires_packed_table():
    choice = get_best_arch("criteo-kaggle", "autoctr")
    plan = build_fixed_plan(
        choice, OPS_CONFIG_LIB["autoctr"], 7, 13, 26, tuple([8] * 26),
        use_layernorm=False,
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    opt = make_optimizer("adagrad")
    step = make_sparse_embedding_train_step(
        lambda p, d, s: fixed_apply_embedded(plan, p, d, s), opt,
        lambda s: jnp.asarray(0.1), table_offsets(plan.vocab_sizes),
        donate=False, table_update="sweep",
    )
    state = init_train_state(params, opt)  # unpacked [208, 16] layout
    d, c, y = next(iter(synthetic_batches(8, 8, SyntheticSpec(vocab=8), seed=0)))
    with pytest.raises(ValueError, match="pack_state_for_sweep"):
        step(state, d, c, y)


def test_sweep_row_offset_shards_reproduce_full_table(rng):
    """Row-sharded sweep (parallel/sparse.py): per-shard calls with
    `row_offset` over the SAME global sorted stream must reproduce the
    full-table sweep bit-exactly — each shard's tile boundaries are
    searchsorted into the global stream, so positions owned by other
    shards fall outside every span and are skipped, and the window
    alignment within an owned tile is identical to the full-table call."""
    tpad = 4 * tsp.ROWS_PER_TILE
    n = 3000
    idx = rng.randint(0, tpad, size=n)
    g = rng.randn(n, 16).astype(np.float32)
    rows, seg16, _ = rowwise_segment_sum(
        jnp.asarray(idx, jnp.int32), jnp.asarray(g)
    )
    tp = tpad // tsp.GROUP
    table_np = rng.randn(tp, tsp.LANES).astype(np.float32)
    acc_np = np.abs(rng.randn(tp, tsp.LANES)).astype(np.float32)

    full_t, full_a = tsp.sweep_adagrad_update(
        jnp.asarray(table_np), jnp.asarray(acc_np), rows, seg16, 0.07,
        interpret=True,
    )
    full_t, full_a = np.asarray(full_t), np.asarray(full_a)

    for shards in (2, 4):
        per = tp // shards
        assert per % tsp.K_TILE == 0
        parts = [
            tsp.sweep_adagrad_update(
                jnp.asarray(table_np[m * per:(m + 1) * per]),
                jnp.asarray(acc_np[m * per:(m + 1) * per]),
                rows, seg16, 0.07, m * per, interpret=True,
            )
            for m in range(shards)
        ]
        got_t = np.concatenate([np.asarray(t) for t, _ in parts], axis=0)
        got_a = np.concatenate([np.asarray(a) for _, a in parts], axis=0)
        np.testing.assert_array_equal(got_t, full_t)
        np.testing.assert_array_equal(got_a, full_a)


def test_schedule_budget_tight(rng):
    """BUDGET = ceil(n/unit) + n_tiles + 1 is sufficient for ANY index
    distribution: tile t needs ceil(e_t/unit) - floor(s_t/unit) steps and
    touched segments are consecutive (s_{t+1} >= e_t), so the terms
    telescope to <= ceil(n/unit) + #touched.  A budget underflow would
    silently drop updates, so pin the bound directly against the schedule
    builder's own window counts across adversarial shapes."""
    for trial in range(200):
        n_tiles = int(rng.randint(1, 24))
        rows_per_tile = 64  # stand-in tile granularity for the bound math
        n = int(rng.randint(1, 1500))
        unit = int(rng.choice([4, 8, 32, 512]))
        kind = trial % 4
        if kind == 0:      # uniform
            idx = rng.randint(0, n_tiles * rows_per_tile, n)
        elif kind == 1:    # zipf skew
            idx = (rng.zipf(1.5, n) - 1) % (n_tiles * rows_per_tile)
        elif kind == 2:    # everything in one tile
            idx = rng.randint(0, rows_per_tile, n)
        else:              # sentinel-heavy tail
            idx = rng.randint(0, n_tiles * rows_per_tile, n)
            idx[n // 2:] = n_tiles * rows_per_tile + 7
        idx = np.sort(idx)
        bounds = np.arange(n_tiles + 1) * rows_per_tile
        starts = np.searchsorted(idx, bounds)
        s, e = starts[:-1], starts[1:]
        aligned = (s // unit) * unit
        need = int(np.where(e > s, -(-(e - aligned) // unit), 0).sum())
        budget = -(-n // unit) + n_tiles + 1
        assert need <= budget, (trial, need, budget)

        # Tie the bound to the real implementation: the schedule builder's
        # own active-step count (each tile contributes exactly one is_last
        # step) must equal the formula above and fit the budget.
        _, _, is_first, is_last, span_s, span_e = tsp._build_schedule(
            jnp.asarray(starts, jnp.int32), n_tiles, n, unit
        )
        is_first, is_last = np.asarray(is_first), np.asarray(is_last)
        span_s, span_e = np.asarray(span_s), np.asarray(span_e)
        assert is_first.shape[0] == budget
        if need == 0:
            # Degenerate all-sentinel schedule: one forced zero-delta apply.
            assert is_first[0] == 1 and is_last[0] == 1
            assert span_s[0] == span_e[0] == 0
        else:
            built = int(np.flatnonzero(is_last).max()) + 1
            assert built == need, (trial, built, need)
            assert int(is_first.sum()) == int(is_last.sum()) == int(
                (e > s).sum()
            )
