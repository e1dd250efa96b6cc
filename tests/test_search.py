"""Search-layer tests: tokenizer, EA loop, vmapped candidate evaluator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.choices import choice_to_masks, validate_choice
from nasrec_tpu.models import SuperNetConfig, supernet_apply, supernet_init
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches
from nasrec_tpu.search import SearchConfig, Searcher, Tokenizer, make_candidate_evaluator
from nasrec_tpu.search.worker import stack_masks
from nasrec_tpu.train.metrics import bce_with_logits


SPACE = OPS_CONFIG_LIB["xlarge"]


def test_tokenize_deterministic_and_discriminative():
    tok = Tokenizer(4, SPACE, seed=0)
    c1 = tok.generate_random_choice()
    c2 = tok.generate_random_choice()
    assert tok.hash_choice(c1) == tok.hash_choice(c1)
    assert tok.hash_choice(c1) != tok.hash_choice(c2)
    # token length: per block 4*nb (macro) + num_nodes + 2 dims + 4 one-hot bits
    want_len = 4 * (4 * 4) + 4 * (SPACE.num_nodes + 2 + 4)
    assert len(tok.tokenize(c1)) == want_len


def test_generated_choices_valid():
    tok = Tokenizer(7, SPACE, seed=1)
    for _ in range(100):
        validate_choice(tok.generate_random_choice(), SPACE, 7)


def test_mutation_changes_exactly_one_key():
    tok = Tokenizer(7, SPACE, seed=2)
    base = tok.generate_random_choice()
    for _ in range(50):
        mutated = tok.mutate_spec(base)
        validate_choice(mutated, SPACE, 7)
        diffs = 0
        for i in range(7):
            for key in ("dense_idx", "sparse_idx", "dense_left_idx", "dense_right_idx"):
                if base["macro"][i][key] != mutated["macro"][i][key]:
                    diffs += 1
            for key in ("active_nodes", "dense_in_dims", "sparse_in_dims",
                        "dense_sparse_interact", "deep_fm"):
                if base["micro"][i][key] != mutated["micro"][i][key]:
                    diffs += 1
        assert diffs <= 1  # may be 0 if resampled value equals the old one


def _fake_eval(choices):
    """Deterministic objective: fewer active blocks in macro -> lower loss."""
    out = []
    for c in choices:
        fanin = sum(len(m["dense_idx"]) + len(m["sparse_idx"]) for m in c["macro"])
        out.append(
            {"choice": c, "test_loss": fanin / 100.0, "test_acc": 1 - fanin / 100.0,
             "test_auroc": 1 - fanin / 100.0}
        )
    return out


def test_random_search_sorts_by_criterion():
    tok = Tokenizer(5, SPACE, seed=3)
    s = Searcher(_fake_eval, tok, SearchConfig(seed=0), log_fn=lambda x: None)
    top = s.random_search_from_supernet(budget=20, top_k=5)
    objs = [r["test_loss"] for r in top]
    assert objs == sorted(objs)
    assert len(s.all_results) == 20


def test_regularized_evolution_improves_and_dedups():
    tok = Tokenizer(5, SPACE, seed=4)
    s = Searcher(_fake_eval, tok, SearchConfig(seed=1), log_fn=lambda x: None)
    history = s.regularized_evolution_from_supernet(
        n_generations=10, n_childs=4, init_population=16, sample_size=8, top_k=2
    )
    assert len(history) == 10 * 2
    hashes = [tok.hash_choice(r["choice"]) for r in s.all_results[16:]]
    assert len(hashes) == len(set(hashes))  # children all deduped
    first_best = min(r["test_loss"] for r in s.all_results[:16])
    last_gen_best = min(r["test_loss"] for r in history[-4:])
    assert last_gen_best <= first_best + 1e-9


def test_latency_penalty_criterion():
    tok = Tokenizer(3, SPACE, seed=5)

    def eval_with_lat(choices):
        res = _fake_eval(choices)
        for i, r in enumerate(res):
            r["latency"] = 0.1 * (i + 1)
        return res

    s = Searcher(
        eval_with_lat, tok,
        SearchConfig(criterion="test_loss_penalty_lat", beta=1.0, target_latency=0.1,
                     seed=0),
        log_fn=lambda x: None,
    )
    top = s.random_search_from_supernet(budget=4, top_k=4)
    objs = [r["test_loss"] + 1.0 * (r["latency"] / 0.1 - 1) for r in top]
    assert objs == sorted(objs)


# ---------------------------------------------------------------------------
# Vmapped weight-shared candidate evaluation
# ---------------------------------------------------------------------------


def test_vmapped_evaluator_matches_sequential():
    """K=2 vmapped fine-tune must equal two independent single-candidate runs."""
    space = OPS_CONFIG_LIB["autoctr"]
    cfg = SuperNetConfig(
        space=space, num_blocks=2, num_dense=13, num_sparse=26,
        vocab_sizes=tuple([100] * 26), use_layernorm=True,
    )
    params = supernet_init(jax.random.PRNGKey(0), cfg)
    tok = Tokenizer(2, space, seed=7)
    choices = [tok.generate_random_choice() for _ in range(2)]
    spec = SyntheticSpec()

    def train_iter_fn():
        return synthetic_batches(1024, 64, spec, seed=0)

    def test_iter_fn():
        return synthetic_batches(512, 128, spec, seed=1)

    results_pair = make_candidate_evaluator(
        cfg, params, max_train_steps=10, max_eval_steps=4
    )(choices, train_iter_fn, test_iter_fn)

    for i, choice in enumerate(choices):
        ri = make_candidate_evaluator(
            cfg, params, max_train_steps=10, max_eval_steps=4
        )([choice], train_iter_fn, test_iter_fn)[0]
        assert results_pair[i]["test_loss"] == pytest.approx(ri["test_loss"], rel=1e-4)
        assert results_pair[i]["test_auroc"] == pytest.approx(ri["test_auroc"], rel=1e-4)


def test_vmapped_evaluator_finetunes_final_only():
    space = OPS_CONFIG_LIB["autoctr"]
    cfg = SuperNetConfig(
        space=space, num_blocks=2, num_dense=13, num_sparse=26,
        vocab_sizes=tuple([100] * 26), use_layernorm=True,
    )
    params = supernet_init(jax.random.PRNGKey(1), cfg)
    tok = Tokenizer(2, space, seed=8)
    choices = [tok.generate_random_choice() for _ in range(3)]
    spec = SyntheticSpec()
    results = make_candidate_evaluator(
        cfg, params, max_train_steps=25, max_eval_steps=4
    )(
        choices,
        lambda: synthetic_batches(2048, 128, spec, seed=0, loop=True),
        lambda: synthetic_batches(512, 128, spec, seed=1),
    )
    assert len(results) == 3
    for r in results:
        assert np.isfinite(r["test_loss"])
        assert 0.0 <= r["test_auroc"] <= 1.0
    # Candidate ranking should not be all identical losses.
    losses = [r["test_loss"] for r in results]
    assert len(set(np.round(losses, 6))) > 1


def test_whole_supernet_finetune_mode():
    """finetune_mode='whole' trains all params sequentially per candidate."""
    space = OPS_CONFIG_LIB["autoctr"]
    cfg = SuperNetConfig(
        space=space, num_blocks=2, num_dense=13, num_sparse=26,
        vocab_sizes=tuple([100] * 26), use_layernorm=True,
    )
    params = supernet_init(jax.random.PRNGKey(2), cfg)
    tok = Tokenizer(2, space, seed=9)
    choices = [tok.generate_random_choice() for _ in range(2)]
    spec = SyntheticSpec()
    results = make_candidate_evaluator(
        cfg, params, max_train_steps=10, max_eval_steps=2, finetune_mode="whole"
    )(
        choices,
        lambda: synthetic_batches(1024, 128, spec, seed=0, loop=True),
        lambda: synthetic_batches(256, 128, spec, seed=1),
    )
    assert len(results) == 2
    assert all(np.isfinite(r["test_loss"]) for r in results)


def test_batched_whole_finetune_matches_sequential():
    """The vmapped whole-net group evaluator reproduces the sequential
    per-candidate results (same fine-tune math, Kx fewer dispatches)."""
    space = OPS_CONFIG_LIB["autoctr"]
    cfg = SuperNetConfig(
        space=space, num_blocks=2, num_dense=13, num_sparse=26,
        vocab_sizes=tuple([60] * 26), use_layernorm=True,
    )
    params = supernet_init(jax.random.PRNGKey(3), cfg)
    tok = Tokenizer(2, space, seed=11)
    choices = [tok.generate_random_choice() for _ in range(2)]
    spec = SyntheticSpec(vocab=60)
    args = dict(max_train_steps=6, max_eval_steps=2)
    mk_train = lambda: synthetic_batches(512, 64, spec, seed=0, loop=True)
    mk_test = lambda: synthetic_batches(256, 128, spec, seed=1)

    for mode in ("whole", "layernorm-calibrate"):
        batched = make_candidate_evaluator(
            cfg, params, finetune_mode=mode, batch_candidates=True, **args
        )(choices, mk_train, mk_test)
        seq = make_candidate_evaluator(
            cfg, params, finetune_mode=mode, batch_candidates=False, **args
        )(choices, mk_train, mk_test)
        for b, s in zip(batched, seq):
            assert b["test_loss"] == pytest.approx(s["test_loss"], rel=2e-4), mode
            assert b["test_auroc"] == pytest.approx(s["test_auroc"], abs=2e-3), mode
