"""End-to-end workload tests (synthetic data, tiny budgets): all four CLIs,
checkpoint/resume, split tool, EA export tool."""

import json
import os
import pickle

import numpy as np
import pytest

from nasrec_tpu.workloads import (
    DataOptions,
    SearchOptions,
    SupernetOptions,
    TrainOptions,
    eval_subnets_from_scratch,
    search_from_supernet,
    train_fixed_subnet,
    train_supernet,
)
from nasrec_tpu.configs import get_best_arch


def _data(bs=128, test_bs=256):
    return DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        train_batch_size=bs, test_batch_size=test_bs,
        synthetic_train_examples=4096, synthetic_test_examples=1024,
    )


def _train(tmp_path=None, steps=30):
    return TrainOptions(
        learning_rate=0.05, display_interval=10, test_interval=steps,
        max_train_steps=steps, max_eval_steps=4,
        logging_dir=str(tmp_path) if tmp_path else None,
    )


def test_train_fixed_subnet_flow(tmp_path):
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    out = train_fixed_subnet(
        payload, _data(), _train(tmp_path), log_fn=lambda s: None
    )
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])
    assert os.path.exists(tmp_path / "checkpoint.pkl")
    assert os.path.exists(tmp_path / "train_test_logs.pickle")
    assert os.path.exists(tmp_path / "configs_args.json")


def test_train_fixed_subnet_sweep_update(tmp_path):
    """table_update='sweep' trains on the packed layout, tracks the scatter
    run numerically, and still saves the standard [vocab, 16] checkpoint."""
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    tr = _train(tmp_path, steps=20)
    out_sw = train_fixed_subnet(
        payload, _data(),
        TrainOptions(**{**tr.__dict__, "table_update": "sweep"}),
        log_fn=lambda s: None,
    )
    out_sc = train_fixed_subnet(
        payload, _data(),
        TrainOptions(**{**tr.__dict__, "logging_dir": None}),
        log_fn=lambda s: None,
    )
    l_sw = out_sw["logs"][0]["test_loss"][-1]
    l_sc = out_sc["logs"][0]["test_loss"][-1]
    assert np.isfinite(l_sw) and abs(l_sw - l_sc) < 1e-4, (l_sw, l_sc)
    with open(tmp_path / "checkpoint.pkl", "rb") as f:
        saved = pickle.load(f)
    # synthetic vocab: 26 slots x 1000 rows, unpacked back from the sweep
    assert saved["params"]["embedding"]["table"].shape == (26000, 16)


def test_train_supernet_and_resume(tmp_path):
    sn = SupernetOptions(
        config="autoctr", num_blocks=2, strategy="default",
        supernet_training_steps=5,
    )
    out = train_supernet(sn, _data(), _train(tmp_path, steps=12), log_fn=lambda s: None)
    ckpt_path = tmp_path / "supernet_checkpoint.pkl"
    assert ckpt_path.exists()
    # resume continues from the saved step counter
    sn2 = SupernetOptions(
        config="autoctr", num_blocks=2, strategy="default",
        supernet_training_steps=5, checkpoint_path=str(ckpt_path),
    )
    out2 = train_supernet(sn2, _data(), _train(None, steps=5), log_fn=lambda s: None)
    assert int(out2["state"].step) == 12 + 5


def test_search_from_supernet_random(tmp_path):
    # Train a tiny supernet, then run random search against its checkpoint.
    sn = SupernetOptions(config="autoctr", num_blocks=2, supernet_training_steps=0)
    train_supernet(sn, _data(), _train(tmp_path, steps=10), log_fn=lambda s: None)
    so = SearchOptions(
        method="random", config="autoctr", num_blocks=2,
        ckpt_path=str(tmp_path / "supernet_checkpoint.pkl"),
        max_train_steps=5, max_eval_steps=2, budget=4, ea_top_k=2, group_size=2,
    )
    results = search_from_supernet(
        so, _data(), logging_dir=str(tmp_path / "search"), log_fn=lambda s: None
    )
    assert len(results) == 2
    losses = [r["test_loss"] for r in results]
    assert losses == sorted(losses)
    assert (tmp_path / "search" / "results.pickle").exists()


def test_evaluate_choices_from_supernet_order_and_count():
    """Explicit-list WS evaluation: results align 1:1 with the input choices
    (the rank-correlation experiment depends on this ordering)."""
    from nasrec_tpu.config import OPS_CONFIG_LIB
    from nasrec_tpu.search import Tokenizer
    from nasrec_tpu.workloads import evaluate_choices_from_supernet

    tok = Tokenizer(2, OPS_CONFIG_LIB["autoctr"], seed=5)
    choices = [tok.generate_random_choice() for _ in range(3)]
    so = SearchOptions(
        config="autoctr", num_blocks=2, ckpt_path=None,
        max_train_steps=3, max_eval_steps=2, group_size=2,
    )
    results = evaluate_choices_from_supernet(
        choices, so, _data(), log_fn=lambda s: None
    )
    assert len(results) == 3
    for r, c in zip(results, choices):
        assert r["choice"] == c
        assert np.isfinite(r["test_loss"])


def test_search_regularized_ea_small():
    so = SearchOptions(
        method="regularized-ea", config="autoctr", num_blocks=2,
        ckpt_path=None, max_train_steps=3, max_eval_steps=2,
        n_generations=2, n_childs=2, init_population=4, sample_size=3,
        ea_top_k=1, group_size=2,
    )
    results = search_from_supernet(so, _data(), log_fn=lambda s: None)
    assert len(results) == 2  # top_k per generation x generations


def test_search_latency_penalty_ea(monkeypatch):
    """Latency-criterion EA (beta > 0) end-to-end over >2 candidates with
    the default compile-free cost-model estimator: every scored candidate
    must carry a positive finite latency, the estimator must be traced (not
    jitted) per DISTINCT plan only, and chip calibration must run at most
    once per process (ref: searcher.py:65-73)."""
    import nasrec_tpu.profiling as profiling
    import nasrec_tpu.workloads as workloads

    est_calls = {"n": 0}
    calib_calls = {"n": 0}
    real_est = profiling.estimate_latency_cost_model

    def counting_est(fn, args, calib):
        est_calls["n"] += 1
        return real_est(fn, args, calib)

    def fake_calibrate(**kw):
        calib_calls["n"] += 1
        return {"matmul_flops_per_s": 1e12, "copy_bytes_per_s": 1e11}

    # workloads references profiling via the module, so patching the module
    # attributes intercepts the production call sites.
    monkeypatch.setattr(profiling, "estimate_latency_cost_model", counting_est)
    monkeypatch.setattr(profiling, "calibrate_chip", fake_calibrate)
    monkeypatch.setattr(
        profiling, "measure_latency",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("cost-model mode must never wall-clock-measure")
        ),
    )

    so = SearchOptions(
        method="regularized-ea", config="autoctr", num_blocks=2,
        ckpt_path=None, max_train_steps=2, max_eval_steps=1,
        n_generations=2, n_childs=2, init_population=3, sample_size=2,
        ea_top_k=2, group_size=2,
        criterion="test_loss_penalty_lat", beta=0.5, target_latency=1e-3,
        latency_batch_size=32,
    )
    results = search_from_supernet(so, _data(), log_fn=lambda s: None)
    assert len(results) == 4
    for r in results:
        assert np.isfinite(r["test_loss"])
        assert np.isfinite(r["latency"]) and r["latency"] > 0.0
    assert calib_calls["n"] == 1
    # 3 init + 2 gens x 2 childs = 7 scored candidates; the plan cache may
    # only dedupe, never add.
    assert 1 <= est_calls["n"] <= 7


def test_latency_estimator_rejects_unknown():
    so = SearchOptions(
        config="autoctr", num_blocks=2, ckpt_path=None,
        criterion="test_loss_penalty_lat", beta=0.5,
        latency_estimator="bogus",
    )
    with pytest.raises(ValueError, match="latency_estimator"):
        search_from_supernet(so, _data(), log_fn=lambda s: None)


def test_eval_subnets_from_scratch(tmp_path):
    results = eval_subnets_from_scratch(
        num_subnets=2, config="autoctr", num_blocks=2,
        data=_data(), train=_train(None, steps=8),
        logging_dir=str(tmp_path), log_fn=lambda s: None,
    )
    assert len(results) == 2
    assert all("hash_token" in r for r in results)
    assert (tmp_path / "from_scratch_results.pickle").exists()


def test_cli_main_train_synthetic(tmp_path):
    from nasrec_tpu.cli.main_train import main

    main([
        "--net", "supernet-config", "--arch", "criteo-kaggle/autoctr",
        "--data_source", "synthetic", "--max_train_steps", "10",
        "--max_eval_steps", "2", "--test_interval", "10",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--logging_dir", str(tmp_path / "run"),
    ])
    assert (tmp_path / "run" / "checkpoint.pkl").exists()


def test_cli_train_supernet_synthetic():
    from nasrec_tpu.cli.train_supernet import main

    out = main([
        "--config", "autoctr", "--num_blocks", "2", "--data_source", "synthetic",
        "--max_train_steps", "6", "--max_eval_steps", "2", "--test_interval", "6",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--supernet_training_steps", "2",
    ])
    assert int(out["state"].step) == 6


def test_split_tool_roundtrip(tmp_path):
    from nasrec_tpu.tools.split_data import split_dataset

    rng = np.random.RandomState(0)
    lines = [
        f"{rng.randint(0, 2)}\t" + "\t".join(str(rng.randint(0, 9)) for _ in range(5)) + "\n"
        for _ in range(200)
    ]
    counts = split_dataset(
        lambda: iter(lines), str(tmp_path), num_shards=2, log_fn=lambda s: None
    )
    assert sum(counts) == 200
    # 8/1/1 folds
    assert counts[0] == 160 and counts[1] == 20 and counts[2] == 20
    got = []
    for shard in ("shard-0", "shard-1"):
        for name in ("train", "val", "test"):
            f = tmp_path / shard / f"{name}.txt"
            assert f.exists()
            got += f.read_text().splitlines()
    assert sorted(got) == sorted(l.rstrip("\n") for l in lines)
    # trainval = train + val per shard
    tv = []
    for shard in ("shard-0", "shard-1"):
        tv += (tmp_path / shard / "trainval.txt").read_text().splitlines()
    assert len(tv) == 180


def test_export_ea_results(tmp_path):
    from nasrec_tpu.search import Tokenizer
    from nasrec_tpu.config import OPS_CONFIG_LIB
    from nasrec_tpu.tools.export_ea_results import export_best

    tok = Tokenizer(2, OPS_CONFIG_LIB["autoctr"], seed=0)
    results = [
        {"choice": tok.generate_random_choice(), "test_loss": 0.5 - 0.1 * i}
        for i in range(4)
    ]
    results.append(dict(results[-1]))  # duplicate to test dedup
    paths = export_best(
        results, str(tmp_path), "autoctr", 2, True, top_k=3, log_fn=lambda s: None
    )
    assert len(paths) == 3
    payload = json.loads(open(paths[0]).read())
    assert payload["config"] == "autoctr"
    assert payload["test_loss"] == pytest.approx(0.2)
    # best_config_0 is the lowest loss and dedup dropped the duplicate
    losses = [json.loads(open(p).read())["test_loss"] for p in paths]
    assert losses == sorted(losses)


def test_train_supernet_sampled_eval_path():
    sn = SupernetOptions(
        config="xlarge-zeros", num_blocks=2, strategy="any-path",
        supernet_training_steps=0, eval_path="sampled",
    )
    out = train_supernet(sn, _data(), _train(None, steps=8), log_fn=lambda s: None)
    logs = out["logs"][0]
    assert logs["test_loss"] and np.isfinite(logs["test_loss"][-1])


def test_supernet_pretrained_embedding_seed(tmp_path):
    # Train once to produce a donor checkpoint, then seed a fresh supernet
    # from it (completes the reference's unwired --pretrained_dlrm_emb_path).
    sn = SupernetOptions(config="autoctr", num_blocks=2, supernet_training_steps=0)
    out1 = train_supernet(sn, _data(), _train(tmp_path, steps=5), log_fn=lambda s: None)
    donor = str(tmp_path / "supernet_checkpoint.pkl")
    sn2 = SupernetOptions(config="autoctr", num_blocks=2,
                          supernet_training_steps=0, pretrained_emb_path=donor)
    msgs = []
    train_supernet(sn2, _data(), _train(None, steps=2), log_fn=msgs.append)
    assert any("seeded embedding table" in m for m in msgs)


def test_eval_best_candidates_topk_launcher(tmp_path):
    """The top-k launcher (SLURM generator re-imagined, ref:
    eval_best_candidate_top15.py:52-148) runs exported EA configs."""
    import importlib.util

    from nasrec_tpu.search import Tokenizer
    from nasrec_tpu.config import OPS_CONFIG_LIB
    from nasrec_tpu.tools.export_ea_results import export_best

    tok = Tokenizer(2, OPS_CONFIG_LIB["autoctr"], seed=0)
    results = [
        {"choice": tok.generate_random_choice(), "test_loss": 0.4 + 0.01 * i}
        for i in range(2)
    ]
    ea_dir = tmp_path / "export"
    export_best(results, str(ea_dir), "autoctr", 2, True, top_k=2,
                log_fn=lambda s: None)

    spec = importlib.util.spec_from_file_location(
        "topk_launcher",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "eval_best_candidate", "eval_best_candidates_topk.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ranked = mod.main([
        "--ea_dir", str(ea_dir), "--dataset", "criteo-kaggle",
        "--data_source", "synthetic", "--top_k", "2",
        "--max_train_steps", "5", "--max_eval_steps", "2",
        "--test_interval", "5",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--logging_root", str(tmp_path / "runs"),
    ])
    assert len(ranked) == 2
    losses = [r["val_loss"] for r in ranked]
    assert losses == sorted(losses) and all(np.isfinite(losses))
    assert (tmp_path / "runs" / "summary_host0.json").exists()


def test_conflicting_train_options_raise():
    """Option combinations that would silently diverge must fail fast."""
    import dataclasses

    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {"macro": choice["macro"], "micro": choice["micro"],
               "config": "autoctr", "num_blocks": 7}
    base = _train(steps=2)
    bad = [
        dataclasses.replace(base, mesh_model=2, place_embedding_on_cpu=True),
        # dense mesh path (wd>0 disables sparse embedding): no grad accumulation
        dataclasses.replace(base, mesh_model=2, micro_batches=2, wd=1e-4),
        dataclasses.replace(base, place_embedding_on_cpu=True, micro_batches=2),
        dataclasses.replace(base, place_embedding_on_cpu=True, optimizer="sgd"),
        dataclasses.replace(base, place_embedding_on_cpu=True, wd=1e-4),
    ]
    for t in bad:
        with pytest.raises(ValueError):
            train_fixed_subnet(payload, _data(), t, log_fn=lambda s: None)
    with pytest.raises(ValueError):
        train_supernet(
            SupernetOptions(config="autoctr", num_blocks=7),
            _data(),
            dataclasses.replace(base, mesh_model=2, micro_batches=2, wd=1e-4),
            log_fn=lambda s: None,
        )


def test_cached_method_cli(tmp_path):
    """--method cached re-scores an explicit candidate pickle against a
    supernet checkpoint via the CLI (ref: eval_subnet_from_supernet.py:252-283)."""
    from nasrec_tpu.cli.eval_subnet_from_supernet import main
    from nasrec_tpu.config import OPS_CONFIG_LIB
    from nasrec_tpu.search import Tokenizer

    sn = SupernetOptions(config="autoctr", num_blocks=2, supernet_training_steps=0)
    train_supernet(sn, _data(), _train(tmp_path, steps=8), log_fn=lambda s: None)

    tok = Tokenizer(2, OPS_CONFIG_LIB["autoctr"], seed=3)
    records = [
        {"choice": tok.generate_random_choice(), "test_loss": 0.44 + 0.01 * i}
        for i in range(3)
    ]
    rec_path = tmp_path / "records.pickle"
    with open(rec_path, "wb") as f:
        pickle.dump(records, f)

    out_dir = tmp_path / "cached"
    results = main([
        "--method", "cached",
        "--choice_from_pickle_file", str(rec_path),
        "--ckpt_path", str(tmp_path / "supernet_checkpoint.pkl"),
        "--config", "autoctr", "--num_blocks", "2",
        "--data_source", "synthetic",
        "--train_batch_size", "64", "--test_batch_size", "128",
        "--max_train_steps", "4", "--max_eval_steps", "2",
        "--group_size", "2",
        "--logging_dir", str(out_dir),
    ])
    assert len(results) == 3
    # results align 1:1 with the input records and carry the GT loss through
    for rec, res in zip(records, results):
        assert res["choice"] == rec["choice"]
        assert res["gt_test_loss"] == rec["test_loss"]
        assert np.isfinite(res["test_loss"])
    with open(out_dir / "results.pickle", "rb") as f:
        dumped = pickle.load(f)
    assert len(dumped) == 3


def test_sweep_best_params_standard_layout(tmp_path):
    """best_params under table_update='sweep' must come back in the standard
    [vocab, 16] layout, not the packed [T/8, 128] sweep layout."""
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    tr = _train(tmp_path, steps=10)
    out = train_fixed_subnet(
        payload, _data(),
        TrainOptions(**{**tr.__dict__, "table_update": "sweep"}),
        log_fn=lambda s: None,
    )
    best = out["best_params"]
    assert best is not None
    assert best["embedding"]["table"].shape == (26000, 16)
    with open(tmp_path / "checkpoint.pkl", "rb") as f:
        saved = pickle.load(f)
    # best table layout matches the checkpoint's standard layout exactly
    assert saved["params"]["embedding"]["table"].shape == (26000, 16)


def test_table_update_auto_policy_extremes():
    """The 'auto' resolver picks sweep at flagship scale and scatter at
    search scale (VERDICT r3 item 6: flagship performance must be the
    default, with the decision pinned at both extremes)."""
    from nasrec_tpu.config import DATASETS, SEARCH_MAX_NUM_EMBEDDINGS
    from nasrec_tpu.workloads import _resolve_table_update

    auto = TrainOptions()          # default table_update is "auto"
    assert auto.table_update == "auto"
    spec = DATASETS["criteo-kaggle"]
    full_rows = int(sum(spec.vocab_sizes(None)))
    capped_rows = int(sum(spec.vocab_sizes(SEARCH_MAX_NUM_EMBEDDINGS)))

    # Flagship: batch 32768, full 33.8M-row tables -> sweep.
    assert _resolve_table_update(
        auto, 32768, spec.num_sparse, full_rows, 16, backend="tpu"
    ) == "sweep"
    # Search fine-tune: batch 512, 0.5M-capped tables -> scatter.
    assert _resolve_table_update(
        auto, 512, spec.num_sparse, capped_rows, 16, backend="tpu"
    ) == "scatter"
    # Off-TPU backends always resolve to scatter (no interpreter perf story).
    assert _resolve_table_update(
        auto, 32768, spec.num_sparse, full_rows, 16, backend="cpu"
    ) == "scatter"
    # Paths that cannot run the sweep resolve to scatter even at flagship.
    import dataclasses
    dense = dataclasses.replace(auto, wd=1e-4)        # dense-grad L2 path
    assert _resolve_table_update(
        dense, 32768, spec.num_sparse, full_rows, 16, backend="tpu"
    ) == "scatter"
    # Explicit choices pass through untouched.
    for explicit in ("scatter", "sweep"):
        t = dataclasses.replace(auto, table_update=explicit)
        assert _resolve_table_update(
            t, 512, spec.num_sparse, capped_rows, 16, backend="tpu"
        ) == explicit


def test_report_flops_dumps_model_graph(tmp_path):
    """--report_flops with a logging_dir writes the forward's StableHLO and
    jaxpr (the TPU-native stand-in for the reference's TensorBoard graph
    dump, ref: main_train.py:129-140)."""
    import dataclasses

    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    tr = dataclasses.replace(_train(tmp_path, steps=3), report_flops=True)
    train_fixed_subnet(payload, _data(), tr, log_fn=lambda s: None)
    hlo = tmp_path / "model_graph" / "forward.stablehlo.txt"
    jaxpr = tmp_path / "model_graph" / "forward.jaxpr.txt"
    assert hlo.exists() and hlo.stat().st_size > 1000
    assert jaxpr.exists() and jaxpr.stat().st_size > 1000


def test_orbax_rejected_under_multiprocess(monkeypatch):
    """ckpt_backend='orbax' must fail fast under multi-process runs: the
    end-of-run writers run on process 0 only and orbax's save barriers would
    deadlock a single caller (r3 advisor finding).  Simulated by patching
    jax.process_count — the validation reads it directly."""
    import dataclasses

    import jax

    from nasrec_tpu.workloads import _validate_train_options

    t = dataclasses.replace(_train(steps=2), ckpt_backend="orbax")
    _validate_train_options(t)  # fine single-process
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="orbax"):
        _validate_train_options(t)
