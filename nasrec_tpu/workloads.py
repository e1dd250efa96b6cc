"""The four NASRec workloads as library functions.

Mirrors the reference entry points (SURVEY.md §3):
  1. train_fixed_subnet      <- nasrec/main_train.py         (--net supernet-config)
  2. train_supernet          <- nasrec/train_supernet.py
  3. search_from_supernet    <- nasrec/eval_subnet_from_supernet.py
  4. eval_subnets_from_scratch <- nasrec/eval_subnet_from_scratch.py

Each function takes a plain options dataclass so the argparse CLIs in
nasrec_tpu/cli/ stay thin and the flows stay unit-testable.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB, SEARCH_MAX_NUM_EMBEDDINGS
from nasrec_tpu.choices import Choice, choice_to_masks, full_path_choice
from nasrec_tpu.models import (
    SuperNetConfig,
    build_fixed_plan,
    fixed_apply,
    fixed_init,
    supernet_apply,
    supernet_init,
)
from nasrec_tpu.sampling import ChoiceSampler
from nasrec_tpu.search import SearchConfig, Searcher, Tokenizer, make_candidate_evaluator
from nasrec_tpu.train import (
    evaluate_one_epoch,
    load_checkpoint,
    make_eval_step,
    make_optimizer,
    make_train_step,
    save_checkpoint,
    train_and_test_one_epoch,
)
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.optim import make_lr_schedule
from nasrec_tpu.data.pipeline import make_dataset_iterators
from nasrec_tpu.data.synthetic import SyntheticSpec, synthetic_batches


@dataclasses.dataclass
class DataOptions:
    dataset: str = "criteo-kaggle"
    root_dir: str = ""
    data_source: str = "tsv"          # tsv | synthetic
    train_split: str = "trainval"
    validate_split: str = "test"
    train_batch_size: int = 256
    test_batch_size: int = 16368
    vocab_cap: Optional[int] = None   # SEARCH_MAX_NUM_EMBEDDINGS during search
    synthetic_train_examples: int = 65536
    synthetic_test_examples: int = 8192
    # Per-slot table size for synthetic data.  Must cover the index range of
    # the synthetic stream: fused-table offsets are cumulative, so an
    # out-of-range per-slot index lands in the NEXT slot's rows (silent
    # cross-slot corruption, not a clamp).
    synthetic_vocab: int = 1000
    # Multi-host: this process reads shards where shard_idx %% num_hosts == host_id.
    host_id: int = 0
    num_hosts: int = 1


@dataclasses.dataclass
class TrainOptions:
    learning_rate: float = 0.16
    wd: float = 0.0
    optimizer: str = "adagrad"
    lr_schedule: str = "cosine"
    num_epochs: int = 1
    train_limit: int = -1             # -1: dataset trainval size
    # Cap on eval EXAMPLES per test pass (ref parses --test_limit on every
    # entry point, main_train.py:366-371, but never consumes it; here it is
    # wired: eval stops after ceil(test_limit / test_batch_size) batches).
    test_limit: int = -1
    display_interval: int = 100
    test_interval: int = 2000
    max_train_steps: int = -1
    max_eval_steps: int = -1
    test_only_at_last_step: bool = False
    grad_clip: float = 5.0
    no_reg_param_name: Optional[str] = None
    activation: str = "relu"
    seed: int = 0
    logging_dir: Optional[str] = None
    report_flops: bool = False        # print params + per-example FLOPs
    profile_dir: Optional[str] = None  # capture a jax.profiler trace
    # Sparse (touched-rows-only) embedding update: "auto" enables it for
    # adagrad with wd=0 — HBM traffic drops from O(table) to O(batch*slots),
    # which is the difference between 0.9ms and 16ms/step at full Criteo vocab.
    sparse_embedding: Any = "auto"     # "auto" | True | False
    # How the sparse path applies the table update (single-chip path):
    #   "auto"    — pick per run from measured cost models (the default, so
    #               flagship-scale runs get flagship performance with no
    #               perf flags): "sweep" when the estimated scatter-pair
    #               time (update positions x ~104 ns each) exceeds the
    #               full-table stream time, else "scatter".  See
    #               _resolve_table_update.
    #   "scatter" — touched-row XLA scatter pair; best when few rows are
    #               touched (small batch / capped vocab).
    #   "sweep"   — Pallas streaming-sweep on the packed [T/8,128] layout
    #               (ops/kernels/table_sweep_pallas.py); XLA scatter is
    #               latency-bound (~104 ns/row), so at full Criteo vocab and
    #               batch 32768 the sweep is 5.3x faster (35 vs 186 ms).
    #               The train state holds the table packed; checkpoints are
    #               unpacked back to [vocab, 16] on save.
    table_update: str = "auto"
    # Multi-chip SPMD: >0 builds a ("data", "model") mesh over all visible
    # devices with this model-axis size (data fills the rest).  Embedding
    # tables are row-sharded over `model`, the batch over `data`; the table
    # update stays touched-rows-only (parallel/sparse.py).  This is the
    # flagship multi-chip entry (replaces ref: main_train.py:275-287 as the
    # top-level training path; the reference is single-GPU only).
    mesh_model: int = 0
    # "bfloat16" runs the model body in bf16 (embedding + logits stay f32) —
    # the TPU stand-in for the reference's --use_amp (ref: main_train.py:210).
    compute_dtype: str = "float32"
    # Keep the fused table + its adagrad state in host RAM; the device step
    # exchanges only the [B,S,E] stem and its gradient per step
    # (ref: place_embedding_on_cpu, supernet.py:253-254, :826-840).
    place_embedding_on_cpu: bool = False
    # Checkpoint backend: "pickle" (single-file, zero-dep) or "orbax"
    # (directory; async, multi-host-aware array storage + json sidecar).
    ckpt_backend: str = "pickle"
    # >1 splits each batch into this many grad-accumulation slices under
    # lax.scan (sparse-embedding path): peak activation HBM drops to one
    # slice, update math stays full-batch — the batch>=65536 enabler.
    micro_batches: int = 1
    # Transformer-node implementation: "auto" picks the fused Pallas body
    # kernel on TPU (ops/kernels/transformer_body_pallas.py; blocks 0/5/6
    # f+b 38/5/24 -> 18/6/10 ms at batch 32768) and the plain XLA ops
    # elsewhere (the Pallas interpreter is slow on CPU).  Training batches
    # on the pallas path must be multiples of 128.
    attention_impl: str = "auto"     # auto | xla | pallas


def _use_sparse_embedding(train: "TrainOptions") -> bool:
    if isinstance(train.sparse_embedding, bool):
        return train.sparse_embedding
    return train.optimizer == "adagrad" and train.wd == 0.0


def _unpad_params(params, vocab):
    """Drop sharding-pad rows from a fetched param tree (checkpoint parity:
    saved tables always have exactly sum(vocab) rows)."""
    total = int(sum(vocab))
    emb = params.get("embedding") if isinstance(params, dict) else None
    if emb and "table" in emb and emb["table"].shape[0] != total:
        params = dict(params)
        params["embedding"] = {**emb, "table": emb["table"][:total]}
    return params


def _shard_state_for_mesh(params, opt, mesh_model: int, start_step: int = 0,
                          opt_state=None, sweep_packed: bool = False):
    """Pad the fused table, build the mesh, place a sharded TrainState.

    sweep_packed=True converts the table (and any restored accumulator) to
    the per-shard sweep-packed layout (parallel.pack_table_for_mesh) instead
    of plain row padding — the table_update='sweep' mesh contract."""
    from nasrec_tpu.parallel import (
        make_mesh,
        pack_table_for_mesh,
        pad_table_for_sharding,
        shard_train_state,
    )

    def prep(emb_params):
        if sweep_packed:
            return {**emb_params,
                    "table": pack_table_for_mesh(emb_params["table"], mesh_model)}
        return pad_table_for_sharding(emb_params, mesh_model)

    mesh = make_mesh(model=mesh_model)
    params = dict(params)
    params["embedding"] = prep(params["embedding"])
    state = init_train_state(params, opt)
    if opt_state is not None:
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
        if isinstance(opt_state, dict) and "embedding" in opt_state:
            opt_state = dict(opt_state)
            opt_state["embedding"] = prep(opt_state["embedding"])
        state = dataclasses.replace(state, opt_state=opt_state)
    state = dataclasses.replace(state, step=jnp.asarray(start_step, jnp.int32))
    return mesh, shard_train_state(state, mesh)


def _globalize_iterators(mesh, train_iter_fn, test_iter_fn, *,
                         slice_local: bool):
    """Multi-process batch assembly: wrap batch iterators so every yielded
    array becomes a GLOBAL jax.Array sharded P("data") over the mesh, built
    from this process's local rows via jax.make_array_from_process_local_data.

    slice_local=True is the replicated-stream case (synthetic data: every
    process generates the identical global batch) — each process feeds only
    its own row range, so the assembled global batch equals the
    single-process batch exactly.  slice_local=False is the host-sharded
    case (tsv: each process reads disjoint file shards) — the local batch IS
    this process's shard and the global batch is the concatenation (global
    batch size = local size x process_count).  All processes must yield the
    same number of batches (collectives are synchronous); the stratified
    8/1/1 shard split keeps counts equal up to one trailing batch, which the
    pipeline already drops when short."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    pid, pc = jax.process_index(), jax.process_count()

    def glob(x):
        x = np.asarray(x)
        if slice_local:
            if x.shape[0] % pc:
                raise ValueError(
                    f"replicated batch of {x.shape[0]} rows does not divide "
                    f"across {pc} processes — use a batch size that is a "
                    f"multiple of the process count"
                )
            per = x.shape[0] // pc
            local = x[pid * per:(pid + 1) * per]
            gshape = x.shape
        else:
            local = x
            gshape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, local, gshape)

    def wrap(it_fn):
        def wrapped(*a, **k):
            for batch in it_fn(*a, **k):
                yield tuple(glob(x) for x in batch)
        return wrapped

    return wrap(train_iter_fn), wrap(test_iter_fn)


def _fetch_params_np(params):
    """device_get that survives multi-process shards (collective)."""
    from nasrec_tpu.train.loop import _fetch_params

    return _fetch_params(params)


def _spec_and_vocab(data: DataOptions):
    spec = DATASETS[data.dataset]
    if data.data_source == "synthetic":
        return spec, tuple([data.synthetic_vocab] * spec.num_sparse)
    return spec, spec.vocab_sizes(data.vocab_cap)


def _make_iterators(data: DataOptions):
    if data.data_source == "synthetic":
        spec = DATASETS[data.dataset]
        sspec = SyntheticSpec(
            num_dense=spec.num_dense, num_sparse=spec.num_sparse,
            vocab=data.synthetic_vocab,
        )

        def train_iter():
            return synthetic_batches(
                data.synthetic_train_examples, data.train_batch_size, sspec,
                seed=0, loop=True,
            )

        def test_iter():
            return synthetic_batches(
                data.synthetic_test_examples, data.test_batch_size, sspec, seed=1
            )

        return train_iter, test_iter
    return make_dataset_iterators(
        data.dataset,
        data.root_dir,
        train_batch_size=data.train_batch_size,
        test_batch_size=data.test_batch_size,
        train_split=data.train_split,
        validate_split=data.validate_split,
        vocab_cap=data.vocab_cap,
        host_id=data.host_id,
        num_hosts=data.num_hosts,
    )


def _max_eval_steps(data: DataOptions, train: TrainOptions) -> int:
    """Eval batch cap: explicit max_eval_steps wins; else derive from the
    test_limit example cap."""
    if train.max_eval_steps != -1:
        return train.max_eval_steps
    if train.test_limit != -1:
        return max(-(-train.test_limit // data.test_batch_size), 1)
    return -1


def _compute_dtype(train: TrainOptions):
    return jnp.bfloat16 if train.compute_dtype in ("bf16", "bfloat16") else jnp.float32


def _attention_impl(train: TrainOptions) -> str:
    if train.attention_impl != "auto":
        return train.attention_impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _search_attention_impl(so) -> str:
    """SearchOptions variant of _attention_impl (the vmapped evaluators).

    Measured at the canonical search scale (experiments/probe_vmap_body.py):
    the fused Pallas body under vmap cuts the final-only group-8 fine-tune
    from 2.43 to 1.03 s/candidate (2.37x), loss drift 7e-5."""
    if so.attention_impl != "auto":
        return so.attention_impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# Measured constants behind the table-update auto policy (on-TPU v5e,
# STATUS.md component table / experiments/probe_table_sweep.py,
# probe_sweep_ktile.py):
#   - XLA's TPU scatter costs ~104 ns PER UPDATE INDEX regardless of
#     uniqueness, and the adagrad update issues a pair of scatters
#     (table + accumulator);
#   - the streaming-sweep kernel reads+writes table and accumulator once,
#     at ~244 GB/s under the production schedule (35.4 ms for the
#     33.8M-row x 16 f32 flagship table), plus a ~6 ms per-call floor
#     (kernel launch + window DMA setup, flat across tile configs).
_SCATTER_NS_PER_INDEX = 104.0
_SWEEP_STREAM_BYTES_PER_S = 244e9
_SWEEP_FIXED_OVERHEAD_S = 6e-3


def _resolve_table_update(train: TrainOptions, batch: int, num_sparse: int,
                          total_vocab_rows: int, emb_dim: int,
                          backend: Optional[str] = None) -> str:
    """Resolve table_update='auto' to 'sweep' or 'scatter' for this run.

    'sweep' wins when the estimated XLA scatter-pair time for this batch's
    update positions exceeds the full-table stream time; both estimates use
    constants measured on this hardware class (see above).  At the two
    canonical operating points: flagship fixed-subnet training
    (batch 32768 x 26 slots, 33.8M rows) -> scatter ~177 ms vs sweep ~41 ms
    -> sweep; search-scale fine-tune (batch 512 x 26, 0.5M-capped ~7.4M
    rows) -> scatter ~2.8 ms vs sweep ~14 ms -> scatter.  Paths that cannot
    run the sweep (dense-grad optimizer, host-offloaded table) and non-TPU
    backends (the Pallas interpreter has no perf story) resolve to scatter.
    Ref anchor for the no-flags UX: the reference's one-GPU default path
    needs no performance flags (ref: main_train.py:275-287).
    """
    if train.table_update != "auto":
        return train.table_update
    if not _use_sparse_embedding(train) or train.place_embedding_on_cpu:
        return "scatter"
    if (backend or jax.default_backend()) != "tpu":
        return "scatter"
    scatter_s = 2.0 * batch * num_sparse * _SCATTER_NS_PER_INDEX * 1e-9
    sweep_s = (4.0 * total_vocab_rows * emb_dim * 4
               / _SWEEP_STREAM_BYTES_PER_S) + _SWEEP_FIXED_OVERHEAD_S
    return "sweep" if sweep_s < scatter_s else "scatter"


def _validate_train_options(train: TrainOptions) -> None:
    """Reject silently-conflicting option combinations up front."""
    if train.ckpt_backend == "orbax" and jax.process_count() > 1:
        raise ValueError(
            "ckpt_backend='orbax' is not supported under multi-process runs: "
            "the end-of-run writers run on process 0 only, and orbax's save "
            "performs cross-process sync barriers that would deadlock with a "
            "single caller — use ckpt_backend='pickle' (its per-host sharded "
            "variant lives in nasrec_tpu/parallel)"
        )
    if train.mesh_model > 0 and train.place_embedding_on_cpu:
        raise ValueError(
            "place_embedding_on_cpu and mesh_model are mutually exclusive: "
            "the mesh path shards the table over device HBM"
        )
    if (train.mesh_model > 0 and train.micro_batches > 1
            and not _use_sparse_embedding(train)):
        raise ValueError(
            "micro_batches > 1 with mesh_model requires the sparse-embedding "
            "path (adagrad, wd=0 or sparse_embedding=True); the dense mesh "
            "step has no gradient-accumulation support"
        )
    if train.place_embedding_on_cpu and train.micro_batches > 1:
        raise ValueError(
            "micro_batches > 1 is not supported with place_embedding_on_cpu"
        )
    if train.place_embedding_on_cpu and train.optimizer != "adagrad":
        raise ValueError(
            "place_embedding_on_cpu trains the host table with Adagrad "
            f"(ref semantics); optimizer={train.optimizer!r} would silently "
            "diverge from the on-device run — use adagrad or keep the table "
            "on device"
        )
    if train.place_embedding_on_cpu and train.wd > 0.0:
        raise ValueError(
            "place_embedding_on_cpu cannot apply the L2 loss term to the "
            "host-resident table (that would be a dense full-table update "
            "per step); wd > 0 would silently diverge from the on-device "
            "run — use wd=0 with offload"
        )


def _train_steps_per_epoch(data: DataOptions, train: TrainOptions) -> int:
    if train.max_train_steps != -1:
        return train.max_train_steps
    if data.data_source == "synthetic":
        return data.synthetic_train_examples // data.train_batch_size
    limit = train.train_limit
    if limit == -1:
        spec = DATASETS[data.dataset]
        limit = spec.num_trainval if data.train_split == "trainval" else spec.num_train
    return limit // data.train_batch_size


def _dump_logs(logging_dir: Optional[str], epoch_logs, options: Dict, ckpt_payload=None,
               ckpt_name: str = "checkpoint.pkl", ckpt_backend: str = "pickle"):
    if not logging_dir:
        return
    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # one writer per (possibly shared) filesystem
    os.makedirs(logging_dir, exist_ok=True)
    with open(os.path.join(logging_dir, "configs_args.json"), "w") as f:
        json.dump(options, f, indent=2, default=str)
    with open(os.path.join(logging_dir, "train_test_logs.pickle"), "wb") as f:
        pickle.dump(epoch_logs, f)
    with open(os.path.join(logging_dir, "train_test_logs.json"), "w") as f:
        json.dump(epoch_logs, f)
    if ckpt_payload is not None:
        from nasrec_tpu.train.checkpoint import save_checkpoint_any

        if ckpt_backend == "orbax":
            if jax.process_count() > 1:
                # Defense in depth (validated up front in
                # _validate_train_options): orbax save barriers would
                # deadlock with a single-process caller — never lose a
                # finished run to the checkpoint writer.
                print("ckpt_backend='orbax' unusable under multi-process; "
                      "falling back to pickle for this save")
                ckpt_backend = "pickle"
            else:
                ckpt_name = os.path.splitext(ckpt_name)[0] + ".orbax"
        save_checkpoint_any(
            os.path.join(logging_dir, ckpt_name), ckpt_payload, ckpt_backend
        )


def _report_model_stats(apply_fn, params, data: DataOptions, spec, log_fn,
                        logging_dir: Optional[str] = None):
    """Params + per-example forward FLOPs (fvcore parity, but from XLA's own
    cost analysis which includes batched matmuls, ref: train_utils.py:436-452).

    With a logging_dir, also dumps the model graph: the forward's StableHLO
    text and jaxpr to `model_graph/` — the TPU-native stand-in for the
    reference's TensorBoard graph dump (ref: main_train.py:129-140,
    modules.py:39-54 FLAGS.DEBUG)."""
    from nasrec_tpu.profiling import count_flops, count_params

    dense = jnp.zeros((1, spec.num_dense), jnp.float32)
    cat = jnp.zeros((1, spec.num_sparse), jnp.int32)
    try:
        flops = count_flops(lambda p, d, c: apply_fn(p, d, c), params, dense, cat)
        log_fn(
            f"FLOPS: {flops / 1e6:.4f} M/example \t "
            f"Params: {count_params(params) / 1e6:.4f} M"
        )
    except Exception as e:  # cost analysis may be unavailable on some backends
        log_fn(f"FLOPs analysis unavailable: {e}")
    if logging_dir and (jax.process_count() == 1 or jax.process_index() == 0):
        try:
            gdir = os.path.join(logging_dir, "model_graph")
            os.makedirs(gdir, exist_ok=True)
            lowered = jax.jit(lambda p, d, c: apply_fn(p, d, c)).lower(
                params, dense, cat
            )
            with open(os.path.join(gdir, "forward.stablehlo.txt"), "w") as f:
                f.write(lowered.as_text())
            with open(os.path.join(gdir, "forward.jaxpr.txt"), "w") as f:
                f.write(str(jax.make_jaxpr(
                    lambda p, d, c: apply_fn(p, d, c))(params, dense, cat)))
            log_fn(f"model graph dumped to {gdir}")
        except Exception as e:  # a graph dump must never kill a run
            log_fn(f"model graph dump unavailable: {e}")


class _MaybeProfile:
    def __init__(self, profile_dir: Optional[str]):
        self.dir = profile_dir

    def __enter__(self):
        if self.dir:
            try:
                jax.profiler.start_trace(self.dir)
            except Exception as e:  # profiling must never kill a run
                print(f"profiler unavailable: {e}")
                self.dir = None
        return self

    def __exit__(self, *exc):
        if self.dir:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        return False


# ---------------------------------------------------------------------------
# 1. Fixed-subnet training (best-model reproduction)
# ---------------------------------------------------------------------------


def train_fixed_subnet(
    choice_payload: Dict[str, Any],
    data: DataOptions = DataOptions(),
    train: TrainOptions = TrainOptions(),
    use_layernorm: bool = False,   # reference trains best models without LN
    use_final_sigmoid: bool = False,  # ref: supernet.py:284-287
    last_n_blocks_out: int = 1,    # ref constructor param: supernet.py:226
    log_fn: Callable[[str], None] = print,
) -> Dict[str, Any]:
    """Train one fixed subnet from scratch (ref: main_train.py:77-221)."""
    spec, vocab = _spec_and_vocab(data)
    choice = {"macro": choice_payload["macro"], "micro": choice_payload["micro"]}
    space = OPS_CONFIG_LIB[choice_payload.get("config", "xlarge")]
    num_blocks = int(choice_payload.get("num_blocks", len(choice["macro"])))
    plan = build_fixed_plan(
        choice, space, num_blocks, spec.num_dense, spec.num_sparse, vocab,
        use_layernorm=use_layernorm, activation=train.activation,
        use_final_sigmoid=use_final_sigmoid,
        last_n_blocks_out=last_n_blocks_out,
        attention_impl=_attention_impl(train),
    )
    params = fixed_init(jax.random.PRNGKey(train.seed), plan)
    cdt = _compute_dtype(train)

    steps_per_epoch = _train_steps_per_epoch(data, train)
    num_train_steps = steps_per_epoch * train.num_epochs
    num_warmup = steps_per_epoch // 10 // train.num_epochs  # ref: main_train.py:164
    sched = make_lr_schedule(
        train.lr_schedule, train.learning_rate, num_train_steps, num_warmup
    )
    opt = make_optimizer(train.optimizer)
    if train.table_update not in ("auto", "scatter", "sweep"):
        raise ValueError(f"unknown table_update {train.table_update!r}")
    if train.table_update == "sweep" and train.place_embedding_on_cpu:
        raise ValueError(
            "table_update='sweep' is a device-table path "
            "(not compatible with place_embedding_on_cpu)"
        )
    _validate_train_options(train)
    table_update = _resolve_table_update(
        train, data.train_batch_size, spec.num_sparse, int(sum(vocab)),
        plan.emb_dim,
    )
    packed_eval = False   # True when the state holds the sweep-packed table
    if train.mesh_model > 0:
        from nasrec_tpu.models.embedding import table_offsets
        from nasrec_tpu.models.fixed import fixed_apply_embedded
        from nasrec_tpu.parallel import (
            make_parallel_sparse_train_step,
            make_parallel_train_step,
            make_sharded_packed_stem_lookup,
            make_sharded_stem_lookup,
        )

        if table_update == "sweep":
            if not _use_sparse_embedding(train):
                raise ValueError(
                    "table_update='sweep' requires the sparse-embedding path "
                    "(adagrad, wd=0 or sparse_embedding=True)"
                )
            mesh, state = _shard_state_for_mesh(
                params, opt, train.mesh_model, sweep_packed=True
            )
            lookup = make_sharded_packed_stem_lookup(mesh)
            packed_eval = True
        else:
            mesh, state = _shard_state_for_mesh(params, opt, train.mesh_model)
            lookup = make_sharded_stem_lookup(mesh)
        if _use_sparse_embedding(train):
            step = make_parallel_sparse_train_step(
                lambda p, d, s: fixed_apply_embedded(plan, p, d, s, compute_dtype=cdt),
                opt, sched, mesh, table_offsets(vocab),
                grad_clip=train.grad_clip,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                table_update=table_update,
                microbatch=train.micro_batches,
            )
        else:
            step = make_parallel_train_step(
                lambda p, d, c: fixed_apply(
                    plan, p, d, c, stem_lookup=lookup, compute_dtype=cdt
                ),
                opt, sched, mesh,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                grad_clip=train.grad_clip,
            )
        eval_step = make_eval_step(
            lambda p, d, c: fixed_apply(
                plan, p, d, c, stem_lookup=lookup, compute_dtype=cdt
            )
        )
    elif train.place_embedding_on_cpu:
        from nasrec_tpu.models.embedding import table_offsets
        from nasrec_tpu.models.fixed import fixed_apply_embedded
        from nasrec_tpu.parallel.host_embedding import (
            HostEmbedding,
            make_host_offload_train_step,
        )

        host_emb = HostEmbedding(
            jax.device_get(params["embedding"]["table"]), table_offsets(vocab)
        )
        device_params = {k: v for k, v in params.items() if k != "embedding"}
        state = init_train_state(device_params, opt)
        step = make_host_offload_train_step(
            lambda p, d, s: fixed_apply_embedded(plan, p, d, s, compute_dtype=cdt),
            opt, sched, host_emb, grad_clip=train.grad_clip,
            l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
        )
        embedded_eval = make_eval_step(
            lambda p, d, s: fixed_apply_embedded(plan, p, d, s, compute_dtype=cdt)
        )

        def eval_step(p, d, c):  # host lookup feeds the jitted embedded fwd
            return embedded_eval(p, d, jnp.asarray(host_emb.lookup(np.asarray(c))))
    else:
        state = init_train_state(params, opt)
        if _use_sparse_embedding(train):
            from nasrec_tpu.models.embedding import table_offsets
            from nasrec_tpu.models.fixed import fixed_apply_embedded
            from nasrec_tpu.train.sparse_embedding import (
                make_sparse_embedding_train_step,
                pack_state_for_sweep,
            )

            if table_update == "sweep":
                state = pack_state_for_sweep(state)
                packed_eval = True
            step = make_sparse_embedding_train_step(
                lambda p, d, s: fixed_apply_embedded(plan, p, d, s, compute_dtype=cdt),
                opt, sched, table_offsets(vocab),
                grad_clip=train.grad_clip,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                microbatch=train.micro_batches,
                table_update=table_update,
            )
        else:
            if table_update != "scatter":
                raise ValueError(
                    "table_update='sweep' requires the sparse-embedding path "
                    "(adagrad, wd=0 or sparse_embedding=True)"
                )
            step = make_train_step(
                lambda p, d, c: fixed_apply(plan, p, d, c, compute_dtype=cdt),
                opt, sched,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                grad_clip=train.grad_clip,
            )
        if packed_eval:
            from nasrec_tpu.train.sparse_embedding import packed_stem_lookup

            eval_step = make_eval_step(
                lambda p, d, c: fixed_apply(
                    plan, p, d, c, stem_lookup=packed_stem_lookup,
                    compute_dtype=cdt,
                )
            )
        else:
            eval_step = make_eval_step(
                lambda p, d, c: fixed_apply(plan, p, d, c, compute_dtype=cdt)
            )
    train_iter_fn, test_iter_fn = _make_iterators(data)
    if jax.process_count() > 1:
        if train.mesh_model <= 0:
            raise ValueError(
                "multi-process training requires --mesh_model > 0 (the "
                "(data, model) mesh is what the per-process batch shards "
                "are assembled onto)"
            )
        train_iter_fn, test_iter_fn = _globalize_iterators(
            mesh, train_iter_fn, test_iter_fn,
            slice_local=(data.data_source == "synthetic"),
        )

    if train.report_flops:
        _report_model_stats(
            lambda p, d, c: fixed_apply(plan, p, d, c), params, data, spec,
            log_fn, logging_dir=train.logging_dir,
        )

    from nasrec_tpu.train.logging import MetricsWriter

    writer = MetricsWriter(train.logging_dir)
    epoch_logs = []
    best = None
    with _MaybeProfile(train.profile_dir):
        for epoch in range(train.num_epochs):
            state, logs, best_ep = train_and_test_one_epoch(
                step, eval_step, state, train_iter_fn(), test_iter_fn,
                epoch=epoch,
                display_interval=train.display_interval,
                test_interval=train.test_interval,
                max_train_steps=steps_per_epoch,
                max_eval_steps=_max_eval_steps(data, train),
                test_only_at_last_step=train.test_only_at_last_step,
                log_fn=log_fn,
                metrics_writer=writer,
            )
            epoch_logs.append(logs)
            if best_ep is not None:
                best = best_ep
    writer.close()

    def _unpack_sweep_params(p):
        """Sweep layout -> standard [vocab, 16] checkpoint format."""
        if jax.process_count() > 1:
            # Gather the shards first; the unpack below then runs on
            # process-local (replicated) values instead of issuing eager ops
            # on non-addressable global arrays.
            p = _fetch_params_np(p)
        if train.mesh_model > 0:
            from nasrec_tpu.parallel import unpack_table_from_mesh

            table_std = unpack_table_from_mesh(
                p["embedding"]["table"], int(sum(vocab)), train.mesh_model,
            )
        else:
            from nasrec_tpu.ops.kernels.table_sweep_pallas import unpack_rows

            table_std = unpack_rows(p["embedding"]["table"], int(sum(vocab)))
        out = dict(p)
        out["embedding"] = {**p["embedding"], "table": table_std}
        return _fetch_params_np(out)

    if packed_eval:
        saved_params = _unpack_sweep_params(state.params)
        # best comes out of the train loop still in the packed layout —
        # callers must always see the standard [vocab, 16] table.
        if best is not None:
            best = _unpack_sweep_params(best)
    else:
        saved_params = _unpad_params(_fetch_params_np(state.params), vocab)
    if train.place_embedding_on_cpu:
        saved_params = dict(saved_params)
        saved_params["embedding"] = {"table": host_emb.table}
    _dump_logs(
        train.logging_dir, epoch_logs,
        {"choice": choice_payload, "data": dataclasses.asdict(data),
         "train": dataclasses.asdict(train)},
        ckpt_payload={"params": saved_params, "step": int(state.step)},
        ckpt_backend=train.ckpt_backend,
    )
    return {"state": state, "logs": epoch_logs, "best_params": best, "plan": plan}


# ---------------------------------------------------------------------------
# 2. Supernet one-shot training
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SupernetOptions:
    config: str = "xlarge"
    num_blocks: int = 7
    use_layernorm: bool = True
    strategy: str = "default"
    anypath_choice: str = "binomial-0.5"
    supernet_training_steps: int = 15000
    checkpoint_path: Optional[str] = None   # resume
    # Candidate list for 'evo-2shot-path' (completes the reference's
    # unfinished --evo_2shot_path_candidates flag, ref: train_supernet.py:305).
    evo_2shot_candidates_path: Optional[str] = None
    # Seed the embedding table from a donor checkpoint (completes the
    # reference's unwired --pretrained_dlrm_emb_path, ref: train_supernet.py:413,
    # supernet.py:368-383).
    pretrained_emb_path: Optional[str] = None
    # Supernet eval: "sampled" (reference behavior, the default — the eval
    # forward samples a random subnet per batch, ref: train_utils.py:144-147
    # via SuperNet.forward sampling) or "full-path" (deterministic; every
    # node active — more stable metrics but NOT what the reference logs).
    eval_path: str = "sampled"
    # Apply sigmoid to the final output (ref: supernet.py:284-287).
    use_final_sigmoid: bool = False
    # Head reads the concatenation of the last N blocks' outputs
    # (ref constructor param: supernet.py:226).
    last_n_blocks_out: int = 1


def train_supernet(
    sn: SupernetOptions = SupernetOptions(),
    data: DataOptions = DataOptions(train_batch_size=512, test_batch_size=4096),
    train: TrainOptions = TrainOptions(learning_rate=0.12),
    log_fn: Callable[[str], None] = print,
) -> Dict[str, Any]:
    """One-shot supernet training (ref: train_supernet.py:66-238)."""
    spec, vocab = _spec_and_vocab(data)
    space = OPS_CONFIG_LIB[sn.config]
    cfg = SuperNetConfig(
        space=space, num_blocks=sn.num_blocks, num_dense=spec.num_dense,
        num_sparse=spec.num_sparse, vocab_sizes=vocab,
        use_layernorm=sn.use_layernorm, activation=train.activation,
        use_final_sigmoid=sn.use_final_sigmoid,
        last_n_blocks_out=sn.last_n_blocks_out,
        attention_impl=_attention_impl(train),
    )
    params = supernet_init(jax.random.PRNGKey(train.seed), cfg)
    cdt = _compute_dtype(train)
    if sn.pretrained_emb_path:
        from nasrec_tpu.models.embedding import load_embedding_from_checkpoint

        params = load_embedding_from_checkpoint(params, sn.pretrained_emb_path)
        log_fn(f"seeded embedding table from {sn.pretrained_emb_path}")

    steps_per_epoch = _train_steps_per_epoch(data, train)
    num_train_steps = steps_per_epoch * train.num_epochs
    num_warmup = steps_per_epoch // 10 // train.num_epochs
    sched = make_lr_schedule(
        train.lr_schedule, train.learning_rate, num_train_steps, num_warmup
    )
    opt = make_optimizer(train.optimizer)
    if train.table_update not in ("auto", "scatter"):
        # Explicit rather than silently ignored: the sweep's full-tile stream
        # only beats the touched-row scatter at large batches (>= ~10k
        # positions per tile); the canonical supernet batch is 512, where
        # the scatter pair costs ~1.4 ms — 'auto' therefore resolves to
        # scatter at every supported supernet scale (tables are always
        # search-capped here).  Use sweep on the fixed-subnet workloads
        # (train_fixed_subnet / bench.py), not here.
        raise ValueError(
            "train_supernet supports table_update='scatter' only "
            "(sweep targets large-batch fixed-subnet training)"
        )
    _validate_train_options(train)
    start_step = 0
    resume_opt_state = None
    if sn.checkpoint_path:
        from nasrec_tpu.train.checkpoint import load_any_checkpoint

        ckpt = load_any_checkpoint(sn.checkpoint_path)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        resume_opt_state = ckpt.get("opt_state")
        start_step = int(ckpt.get("step", 0))
        log_fn(f"resumed from {sn.checkpoint_path} at step {start_step}")

    if train.mesh_model > 0:
        from nasrec_tpu.models.embedding import table_offsets
        from nasrec_tpu.models.supernet import supernet_apply_embedded
        from nasrec_tpu.parallel import (
            make_parallel_sparse_train_step,
            make_parallel_train_step,
            make_sharded_stem_lookup,
        )

        mesh, state = _shard_state_for_mesh(
            params, opt, train.mesh_model, start_step, resume_opt_state
        )
        lookup = make_sharded_stem_lookup(mesh)
        if _use_sparse_embedding(train):
            step = make_parallel_sparse_train_step(
                lambda p, d, s, m: supernet_apply_embedded(cfg, p, d, s, m, compute_dtype=cdt),
                opt, sched, mesh, table_offsets(vocab),
                grad_clip=train.grad_clip,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                has_masks=True,
                microbatch=train.micro_batches,
            )
        else:
            step = make_parallel_train_step(
                lambda p, d, c, m: supernet_apply(cfg, p, d, c, m, stem_lookup=lookup, compute_dtype=cdt),
                opt, sched, mesh,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                grad_clip=train.grad_clip, has_masks=True,
            )
        eval_step = make_eval_step(
            lambda p, d, c, m: supernet_apply(cfg, p, d, c, m, stem_lookup=lookup, compute_dtype=cdt),
            has_masks=True,
        )
    elif train.place_embedding_on_cpu:
        from nasrec_tpu.models.embedding import table_offsets
        from nasrec_tpu.models.supernet import supernet_apply_embedded
        from nasrec_tpu.parallel.host_embedding import (
            HostEmbedding,
            make_host_offload_train_step,
        )

        host_emb = HostEmbedding(
            jax.device_get(params["embedding"]["table"]), table_offsets(vocab)
        )
        device_params = {k: v for k, v in params.items() if k != "embedding"}
        state = init_train_state(device_params, opt)
        state = dataclasses.replace(state, step=jnp.asarray(start_step, jnp.int32))
        step = make_host_offload_train_step(
            lambda p, d, s, m: supernet_apply_embedded(cfg, p, d, s, m, compute_dtype=cdt),
            opt, sched, host_emb, grad_clip=train.grad_clip, has_masks=True,
            l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
        )
        embedded_eval = make_eval_step(
            lambda p, d, s, m: supernet_apply_embedded(cfg, p, d, s, m, compute_dtype=cdt),
            has_masks=True,
        )

        def eval_step(p, d, c, m):  # host lookup feeds the jitted embedded fwd
            return embedded_eval(p, d, jnp.asarray(host_emb.lookup(np.asarray(c))), m)
    else:
        state = init_train_state(params, opt)
        if resume_opt_state is not None:
            state = dataclasses.replace(
                state,
                opt_state=jax.tree_util.tree_map(jnp.asarray, resume_opt_state),
            )
        state = dataclasses.replace(state, step=jnp.asarray(start_step, jnp.int32))

        if _use_sparse_embedding(train):
            from nasrec_tpu.models.embedding import table_offsets
            from nasrec_tpu.models.supernet import supernet_apply_embedded
            from nasrec_tpu.train.sparse_embedding import make_sparse_embedding_train_step

            step = make_sparse_embedding_train_step(
                lambda p, d, s, m: supernet_apply_embedded(cfg, p, d, s, m, compute_dtype=cdt),
                opt, sched, table_offsets(vocab),
                grad_clip=train.grad_clip,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                has_masks=True,
                microbatch=train.micro_batches,
            )
        else:
            step = make_train_step(
                lambda p, d, c, m: supernet_apply(cfg, p, d, c, m, compute_dtype=cdt),
                opt, sched,
                l2_reg=train.wd, l2_exclude=train.no_reg_param_name,
                grad_clip=train.grad_clip, has_masks=True,
            )
        eval_step = make_eval_step(
            lambda p, d, c, m: supernet_apply(cfg, p, d, c, m, compute_dtype=cdt), has_masks=True
        )
    candidates = None
    if sn.evo_2shot_candidates_path:
        with open(sn.evo_2shot_candidates_path, "rb") as f:
            candidates = pickle.load(f)
        log_fn(f"loaded {len(candidates)} evo-2shot candidates")
    sampler = ChoiceSampler(
        space, sn.num_blocks, strategy=sn.strategy, anypath_choice=sn.anypath_choice,
        supernet_training_steps=sn.supernet_training_steps, seed=train.seed,
        candidate_choices=candidates,
    )
    sampler.step_counter = start_step - 1
    if sn.eval_path == "sampled":
        eval_sampler = ChoiceSampler(
            space, sn.num_blocks, strategy=sn.strategy,
            anypath_choice=sn.anypath_choice, seed=train.seed + 1,
        )
        eval_masks = lambda: choice_to_masks(eval_sampler(), space, sn.num_blocks)
    else:
        eval_masks = choice_to_masks(
            full_path_choice(space, sn.num_blocks), space, sn.num_blocks
        )
    train_iter_fn, test_iter_fn = _make_iterators(data)
    if jax.process_count() > 1:
        if train.mesh_model <= 0:
            raise ValueError(
                "multi-process training requires --mesh_model > 0 (the "
                "(data, model) mesh is what the per-process batch shards "
                "are assembled onto)"
            )
        train_iter_fn, test_iter_fn = _globalize_iterators(
            mesh, train_iter_fn, test_iter_fn,
            slice_local=(data.data_source == "synthetic"),
        )

    from nasrec_tpu.train.logging import MetricsWriter

    writer = MetricsWriter(train.logging_dir)
    if train.mesh_model > 0 or train.place_embedding_on_cpu:
        # Mesh/offload mode: feed plain host masks; the device-resident
        # buffer's (buffer, idx) tuple is a single-device dispatch
        # optimization handled only by the fused single-chip steps.
        mask_buffer = lambda: choice_to_masks(sampler(), space, sn.num_blocks)
    else:
        from nasrec_tpu.sampling import DeviceMaskBuffer

        mask_buffer = DeviceMaskBuffer(
            sampler, size=min(256, max(steps_per_epoch, 1))
        )
    epoch_logs = []
    for epoch in range(train.num_epochs):
        state, logs, _ = train_and_test_one_epoch(
            step, eval_step, state, train_iter_fn(), test_iter_fn,
            epoch=epoch,
            sampler=mask_buffer,
            eval_masks=eval_masks,
            display_interval=train.display_interval,
            test_interval=train.test_interval,
            max_train_steps=steps_per_epoch,
            max_eval_steps=_max_eval_steps(data, train),
            test_only_at_last_step=train.test_only_at_last_step,
            keep_best=False,
            log_fn=log_fn,
            metrics_writer=writer,
        )
        epoch_logs.append(logs)
    writer.close()

    saved_params = _unpad_params(_fetch_params_np(state.params), vocab)
    saved_opt = _unpad_params(_fetch_params_np(state.opt_state), vocab)
    if train.place_embedding_on_cpu:
        saved_params = {**saved_params, "embedding": {"table": host_emb.table}}
        saved_opt = {**saved_opt, "embedding": {"table": host_emb.acc}}
    ckpt_payload = {
        "params": saved_params,
        "opt_state": saved_opt,
        "step": int(state.step),
        "supernet": dataclasses.asdict(sn),
    }
    _dump_logs(
        train.logging_dir, epoch_logs,
        {"supernet": dataclasses.asdict(sn), "data": dataclasses.asdict(data),
         "train": dataclasses.asdict(train)},
        ckpt_payload=ckpt_payload, ckpt_name="supernet_checkpoint.pkl",
        ckpt_backend=train.ckpt_backend,
    )
    return {"state": state, "logs": epoch_logs, "cfg": cfg}


# ---------------------------------------------------------------------------
# 3. Search (random / regularized EA) over a trained supernet
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SearchOptions:
    method: str = "regularized-ea"   # regularized-ea | random
    config: str = "xlarge"
    num_blocks: int = 7
    use_layernorm: bool = True
    ckpt_path: Optional[str] = None
    learning_rate: float = 0.04
    max_train_steps: int = 500
    max_eval_steps: int = 150
    n_generations: int = 240
    n_childs: int = 8
    init_population: int = 128
    sample_size: int = 64
    ea_top_k: int = 2
    budget: int = 200                # random search budget
    criterion: str = "test_loss"
    group_size: int = 8
    seed: int = 0
    # "final-only" (default) vmaps K candidates per step; "whole" /
    # "layernorm-calibrate" fine-tune full per-candidate param copies — also
    # vmapped as a group unless batch_finetune=False (ref --finetune_whole_supernet).
    finetune_mode: str = "final-only"
    batch_finetune: bool = True
    # Transformer-node impl inside the (vmapped) candidate evaluators:
    # "auto" = fused Pallas body on TPU, XLA elsewhere.  Measured at the
    # canonical search scale (group 8, 200 ft steps bs 512 + 20x1024 eval,
    # capped tables): 2.43 -> 1.03 s/candidate, 2.37x
    # (experiments/probe_vmap_body.py, round 4 — the round-3 "keep XLA for
    # the vmapped evaluators" comment was unmeasured and wrong).
    attention_impl: str = "auto"
    # Latency-aware search (criterion="test_loss_penalty_lat"):
    # objective = test_loss + beta * (latency / target_latency - 1)
    # (TuNAS-style relaxation, ref: searcher.py:65-73)
    beta: float = 0.0
    target_latency: float = -1.0
    latency_batch_size: int = 512
    latency_trials: int = 50
    # How candidate latency is obtained.  "cost-model" (default): compile-
    # free analytic estimate from one trace (dot-FLOPs / measured matmul
    # peak + tensor bytes / measured copy bandwidth; one calibrate_chip()
    # per process) — O(1) compilations for the whole search.  "measured":
    # jit + wall-clock each DISTINCT plan (cached by plan signature) — on
    # this runtime a first compile is 30-250 s, so use it only for final
    # top-k verification, not inside a 240-generation EA.
    latency_estimator: str = "cost-model"


def evaluate_choices_from_supernet(
    choices: List[Dict],
    so: SearchOptions = SearchOptions(),
    data: DataOptions = DataOptions(train_batch_size=512, test_batch_size=8192),
    log_fn: Callable[[str], None] = print,
) -> List[Dict]:
    """Weight-shared evaluation of an EXPLICIT candidate list (no search):
    restore the supernet checkpoint, fine-tune + score each choice with the
    canonical evaluator in group_size groups.  The building block behind
    search_from_supernet, exposed for rank-correlation studies and for
    re-scoring externally supplied archs (ref: eval_subnet_from_supernet.py's
    fixed --supernet_test_path mode, lines 220-260)."""
    spec, vocab = _spec_and_vocab(data)
    space = OPS_CONFIG_LIB[so.config]
    cfg = SuperNetConfig(
        space=space, num_blocks=so.num_blocks, num_dense=spec.num_dense,
        num_sparse=spec.num_sparse, vocab_sizes=vocab,
        use_layernorm=so.use_layernorm,
        attention_impl=_search_attention_impl(so),
    )
    if so.ckpt_path:
        from nasrec_tpu.train.checkpoint import load_any_checkpoint

        ckpt = load_any_checkpoint(so.ckpt_path)
        supernet_params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    else:
        log_fn("WARNING: no supernet checkpoint; scoring against RANDOM weights")
        supernet_params = supernet_init(jax.random.PRNGKey(so.seed), cfg)

    train_iter_fn, test_iter_fn = _make_iterators(data)
    evaluator = make_candidate_evaluator(
        cfg, supernet_params,
        learning_rate=so.learning_rate,
        max_train_steps=so.max_train_steps,
        max_eval_steps=so.max_eval_steps,
        finetune_mode=so.finetune_mode,
        batch_candidates=so.batch_finetune,
    )
    results: List[Dict] = []
    for s in range(0, len(choices), so.group_size):
        group = choices[s : s + so.group_size]
        results.extend(evaluator(group, train_iter_fn, test_iter_fn, log_fn=log_fn))
        log_fn(f"evaluated {min(s + so.group_size, len(choices))}/{len(choices)}")
    return results


def search_from_supernet(
    so: SearchOptions = SearchOptions(),
    data: DataOptions = DataOptions(train_batch_size=512, test_batch_size=8192),
    logging_dir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
) -> List[Dict]:
    """EA / random search with weight-shared fine-tuning
    (ref: eval_subnet_from_supernet.py:220-289)."""
    spec, vocab = _spec_and_vocab(data)
    space = OPS_CONFIG_LIB[so.config]
    cfg = SuperNetConfig(
        space=space, num_blocks=so.num_blocks, num_dense=spec.num_dense,
        num_sparse=spec.num_sparse, vocab_sizes=vocab,
        use_layernorm=so.use_layernorm,
        attention_impl=_search_attention_impl(so),
    )
    if so.ckpt_path:
        from nasrec_tpu.train.checkpoint import load_any_checkpoint

        ckpt = load_any_checkpoint(so.ckpt_path)
        supernet_params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    else:
        log_fn("WARNING: no supernet checkpoint; searching over random weights")
        supernet_params = supernet_init(jax.random.PRNGKey(so.seed), cfg)

    train_iter_fn, test_iter_fn = _make_iterators(data)
    evaluator = make_candidate_evaluator(
        cfg, supernet_params,
        learning_rate=so.learning_rate,
        max_train_steps=so.max_train_steps,
        max_eval_steps=so.max_eval_steps,
        finetune_mode=so.finetune_mode,
        batch_candidates=so.batch_finetune,
    )

    need_latency = so.criterion == "test_loss_penalty_lat" and so.beta != 0.0
    if so.latency_estimator not in ("cost-model", "measured"):
        raise ValueError(f"unknown latency_estimator {so.latency_estimator!r}")

    # Latency per candidate, cached by plan signature (FixedPlan is a frozen
    # dataclass of ints/tuples): EA populations revisit structurally
    # identical plans, and in "measured" mode every cache miss is a fresh
    # XLA compile (30-250 s first-compile on this runtime) — the cache makes
    # a search of N candidates compile O(distinct plans), and "cost-model"
    # (default) compiles nothing at all (ref: searcher_utils.py:77-103).
    _latency_cache: Dict = {}
    _calib: Dict = {}

    def _measure_choice_latency(choice) -> float:
        from nasrec_tpu import profiling

        plan = build_fixed_plan(
            choice, space, so.num_blocks, spec.num_dense, spec.num_sparse, vocab,
            use_layernorm=so.use_layernorm,
        )
        if plan in _latency_cache:
            return _latency_cache[plan]
        params = fixed_init(jax.random.PRNGKey(0), plan)
        dense = jnp.zeros((so.latency_batch_size, spec.num_dense), jnp.float32)
        cat = jnp.zeros((so.latency_batch_size, spec.num_sparse), jnp.int32)
        fwd = lambda p, d, c: fixed_apply(plan, p, d, c)
        if so.latency_estimator == "measured":
            lat, _ = profiling.measure_latency(
                fwd, (params, dense, cat),
                num_warmup_steps=5, num_trials=so.latency_trials,
            )
        else:
            if not _calib:
                # One-time chip calibration (2 tiny jit signatures); sized
                # down from the bench defaults — the denominators only need
                # to be consistent across candidates.
                _calib.update(profiling.calibrate_chip(
                    matmul_dim=2048, copy_mb=64, trials=8,
                ))
            lat = profiling.estimate_latency_cost_model(
                fwd, (params, dense, cat), _calib
            )
        _latency_cache[plan] = lat
        return lat

    def eval_fn(choices):
        t0 = time.time()
        results = evaluator(choices, train_iter_fn, test_iter_fn, log_fn=log_fn)
        if need_latency:
            for r in results:
                r["latency"] = _measure_choice_latency(r["choice"])
        log_fn(f"evaluated {len(choices)} candidates in {time.time() - t0:.1f}s")
        return results

    tokenizer = Tokenizer(so.num_blocks, space, seed=so.seed)
    searcher = Searcher(
        eval_fn, tokenizer,
        SearchConfig(
            criterion=so.criterion, group_size=so.group_size, seed=so.seed,
            beta=so.beta, target_latency=so.target_latency,
            # Multi-process launches fan candidate groups out across
            # processes automatically (the TPU-native analogue of the
            # reference's one-mp.Process-per-GPU searcher fan-out,
            # ref: searcher.py:126-156).
            distribute=jax.process_count() > 1,
        ),
        log_fn=log_fn,
    )
    if so.method == "random":
        results = searcher.random_search_from_supernet(
            budget=so.budget, top_k=min(so.ea_top_k, so.budget)
        )
    elif so.method == "regularized-ea":
        results = searcher.regularized_evolution_from_supernet(
            n_generations=so.n_generations, n_childs=so.n_childs,
            init_population=so.init_population, sample_size=so.sample_size,
            top_k=so.ea_top_k,
        )
    else:
        raise NotImplementedError(f"method {so.method}")

    if logging_dir and jax.process_index() == 0:
        os.makedirs(logging_dir, exist_ok=True)
        with open(os.path.join(logging_dir, "results.pickle"), "wb") as f:
            pickle.dump(results, f)
        with open(os.path.join(logging_dir, "all_results.pickle"), "wb") as f:
            pickle.dump(searcher.all_results, f)
    return results


# ---------------------------------------------------------------------------
# 4. Subnet-from-scratch evaluation (search-space / rank-correlation studies)
# ---------------------------------------------------------------------------


def eval_subnets_from_scratch(
    num_subnets: int = 10,
    choices: Optional[List[Choice]] = None,
    config: str = "xlarge",
    num_blocks: int = 7,
    data: DataOptions = DataOptions(),
    train: TrainOptions = TrainOptions(),
    use_layernorm: bool = False,
    logging_dir: Optional[str] = None,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
) -> List[Dict]:
    """Train N subnets from scratch under step budgets
    (ref: eval_subnet_from_scratch.py:188-242), skipping diverged runs."""
    space = OPS_CONFIG_LIB[config]
    tokenizer = Tokenizer(num_blocks, space, seed=seed)
    if choices is None:
        choices = [tokenizer.generate_random_choice() for _ in range(num_subnets)]
    results = []
    for i, choice in enumerate(choices):
        log_fn(f"--- subnet {i + 1}/{len(choices)}")
        payload = {
            "macro": choice["macro"], "micro": choice["micro"],
            "config": config, "num_blocks": num_blocks,
        }
        out = train_fixed_subnet(
            payload, data, train, use_layernorm=use_layernorm, log_fn=log_fn
        )
        logs = out["logs"][-1]
        result = {
            "choice": choice,
            "test_loss": logs["test_loss"][-1] if logs["test_loss"] else 999.99,
            "test_auroc": logs["test_AUROC"][-1] if logs["test_AUROC"] else -1,
            "test_acc": logs["test_Accuracy"][-1] if logs["test_Accuracy"] else -1,
            "hash_token": tokenizer.hash_choice(choice),
        }
        if result["test_loss"] >= 999.0:
            log_fn("subnet diverged; recording sentinel result")
        results.append(result)
    if logging_dir:
        os.makedirs(logging_dir, exist_ok=True)
        with open(os.path.join(logging_dir, "from_scratch_results.pickle"), "wb") as f:
            pickle.dump(results, f)
    return results
