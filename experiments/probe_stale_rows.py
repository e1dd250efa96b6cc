"""Honest re-measurement of the round-1 (*) throughput rows (EXPERIMENTS §3).

Round 1 measured the supernet step, the EA candidate fine-tune, and the
cache->device feed with `block_until_ready` timing, which on the axon
runtime acknowledges ENQUEUE (dispatch rate, ~30x optimistic).  This probe
re-measures all three with the round-2 methodology: slope timing between
two window sizes with a host scalar readback as the barrier
(profiling.chained_rate), steps chained through state, realistic per-slot
indices over the SEARCH-CAPPED vocab (the configuration these workloads
actually run).

Measures:
  1. supernet train step (xlarge, 7 blocks, capped 0.5M tables, sampled
     masks from a device-resident buffer) at batch 512 (canonical,
     scripts/train_supernet/*.sh) and 8192
  2. EA candidate fine-tune: wall seconds/candidate for a group of 8
     (final-only vmapped, 200 ft steps @ bs 512 + 20 eval batches of 1024)
     — results are fetched host-side, so wall time IS completion time
  3. binary-cache -> device feed: memmapped batches H2D + a trivial
     consume, chained through a device scalar

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_stale_rows.py
"""
import os
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB, SEARCH_MAX_NUM_EMBEDDINGS
from nasrec_tpu.models import SuperNetConfig, supernet_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.supernet import supernet_apply_embedded
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.sampling import ChoiceSampler, DeviceMaskBuffer
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.optim import make_lr_schedule
from nasrec_tpu.train.sparse_embedding import make_sparse_embedding_train_step

spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(SEARCH_MAX_NUM_EMBEDDINGS)   # capped: search config
space = OPS_CONFIG_LIB["xlarge"]
rng = np.random.RandomState(0)


def draw(batch):
    cols = [rng.randint(0, v, size=batch) for v in vocab]
    return (
        jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32)),
        jnp.asarray(np.stack(cols, 1).astype(np.int32)),
        jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32)),
    )


# --- 1. supernet train step --------------------------------------------------
cfg = SuperNetConfig(
    space=space, num_blocks=7, num_dense=spec.num_dense,
    num_sparse=spec.num_sparse, vocab_sizes=vocab, use_layernorm=True,
)
params = supernet_init(jax.random.PRNGKey(0), cfg)
opt = make_optimizer("adagrad")
sched = make_lr_schedule("cosine", 0.12, 10_000, 1_000)
sampler = ChoiceSampler(space, 7, strategy="default",
                        anypath_choice="binomial-0.5",
                        supernet_training_steps=100, seed=0)
masks = DeviceMaskBuffer(sampler, size=64)

for batch in (512, 8192):
    step = make_sparse_embedding_train_step(
        lambda p, d, s, m: supernet_apply_embedded(cfg, p, d, s, m),
        opt, sched, table_offsets(vocab), grad_clip=5.0, has_masks=True,
        donate=True,
    )
    # params alias into the state and the step DONATES it — copy per config.
    state = init_train_state(
        jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params), opt
    )
    batches = [draw(batch) for _ in range(4)]
    box = {"s": state}

    def run_k(k):
        st = box["s"]
        for i in range(k):
            d, c, y = batches[i % 4]
            st, m = step(st, d, c, y, masks())
        box["s"] = st
        jax.device_get(m["loss"])

    run_k(8)
    dt = chained_rate(run_k, 25, 100)
    print(f"supernet step bs={batch}: {dt*1e3:.2f} ms "
          f"({batch/dt/1e3:.1f}k ex/s)", flush=True)
    del box, state

# --- 2. EA candidate fine-tune ----------------------------------------------
from nasrec_tpu.search import Tokenizer
from nasrec_tpu.search.worker import make_candidate_evaluator
from nasrec_tpu.choices import choice_to_masks

tok = Tokenizer(7, space, seed=1)
choices = [tok.generate_random_choice() for _ in range(8)]
FT_STEPS, EVAL_BATCHES = 200, 20
ev = make_candidate_evaluator(
    cfg, jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params),
    learning_rate=0.04, max_train_steps=FT_STEPS,
    max_eval_steps=EVAL_BATCHES, finetune_mode="final-only",
)
ft_batches = [draw(512) for _ in range(8)]
ev_batches = [draw(1024) for _ in range(4)]


def train_iter_fn():
    for i in range(FT_STEPS):
        yield ft_batches[i % len(ft_batches)]


def test_iter_fn():
    for i in range(EVAL_BATCHES):
        yield ev_batches[i % len(ev_batches)]


res = ev(choices, train_iter_fn, test_iter_fn)      # compile warmup
t0 = time.perf_counter()
res = ev(choices, train_iter_fn, test_iter_fn)
dt = time.perf_counter() - t0
assert all(np.isfinite(r["test_loss"]) for r in res)
print(f"EA candidate fine-tune (group 8, {FT_STEPS} steps bs 512 + "
      f"{EVAL_BATCHES}x1024 eval): {dt:.2f} s wall "
      f"= {dt/8:.3f} s/candidate "
      f"(~{dt/(FT_STEPS+EVAL_BATCHES)*1e3:.1f} ms per vmapped-8 step+eval "
      f"batch, host feed included)", flush=True)

# --- 3. cache -> device feed ------------------------------------------------
tmp = tempfile.mkdtemp(prefix="nasrec_cacheprobe_")
n_rows, feed_bs = 1_048_576, 32768
pfx = os.path.join(tmp, "probe")
np.save(pfx + ".dense.npy",
        rng.randn(n_rows, spec.num_dense).astype(np.float32))
np.save(pfx + ".cat.npy",
        np.stack([rng.randint(0, v, size=n_rows) for v in vocab], 1)
        .astype(np.int32))
np.save(pfx + ".label.npy",
        rng.randint(0, 2, size=(n_rows, 1)).astype(np.float32))

from nasrec_tpu.data.cache import open_binary_cache
from nasrec_tpu.data.pipeline import device_prefetch


@jax.jit
def consume(s, d, c, y):
    return s + d[0, 0] + c[0, 0] + y[0, 0]


def feed_k(k):
    it = device_prefetch(
        open_binary_cache(pfx, feed_bs, shuffle=False, loop=True), depth=2
    )
    s = jnp.float32(0.0)
    for i, (d, c, y) in enumerate(it):
        s = consume(s, d, c, y)
        if i + 1 >= k:
            break
    jax.device_get(s)


feed_k(4)
dt = chained_rate(feed_k, 8, 24)
print(f"cache->device feed bs={feed_bs}: {dt*1e3:.2f} ms/batch "
      f"({feed_bs/dt/1e6:.2f}M ex/s)", flush=True)
