"""Per-HLO-op attribution of the flagship fwd+bwd via a jax.profiler trace.

The r4 stage attribution leaves 75.1 ms in the model fwd+bwd whose matmul
FLOPs are ~2 ms — this captures a device trace of the embedded fwd+bwd and
prints the top HLO ops by self time (parsed with xprof's converter, no
TensorBoard UI needed).  If the axon remote runtime yields no device-side
xplane, the probe says so instead of guessing.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_trace_body.py
"""
import glob
import json
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.train.metrics import bce_with_logits

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
offsets = np.asarray(table_offsets(vocab), np.int32)
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(
    choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense, spec.num_sparse,
    vocab, use_layernorm=False, attention_impl="pallas",
)
params = fixed_init(jax.random.PRNGKey(0), plan)
rest = {k: v for k, v in params.items() if k != "embedding"}

rng = np.random.RandomState(0)
cat = jnp.asarray(np.stack(
    [rng.randint(0, v, size=batch) for v in vocab], 1).astype(np.int32))
dense = jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32))
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))
stem = jax.jit(
    lambda t, c: jnp.take(
        t, (c + jnp.asarray(offsets)[None, :]).reshape(-1), axis=0
    ).reshape(batch, -1)
)(params["embedding"]["table"], cat)


def fwdbwd(rp, s, d, yy):
    def loss(rpp, si):
        lg = fixed_apply_embedded(plan, rpp, d, si)
        return bce_with_logits(lg, yy)
    l, g = jax.value_and_grad(loss, argnums=(0, 1))(rp, s)
    return l, jax.tree_util.tree_leaves(g)[0].sum()


jf = jax.jit(fwdbwd)
jax.device_get(jf(rest, stem, dense, y))   # compile before tracing

tmp = tempfile.mkdtemp(prefix="nasrec_trace_")
with jax.profiler.trace(tmp):
    o = None
    for _ in range(4):
        o = jf(rest, stem, dense, y)
    jax.device_get(o[1])

paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
print("xplane files:", paths, flush=True)
if not paths:
    raise SystemExit("no xplane captured (remote runtime?)")

from xprof.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
if isinstance(data, bytes):
    data = data.decode("utf-8", "replace")
# hlo_stats is a JSON-ish table; dump the head for inspection and also try
# to parse rows sorted by self time.
out = os.path.join(tmp, "hlo_stats.json")
with open(out, "w") as f:
    f.write(data)
print("wrote", out, "bytes", len(data), flush=True)
try:
    j = json.loads(data)
    rows = j if isinstance(j, list) else j.get("data", j)
    print(type(rows), str(rows)[:500], flush=True)
except Exception as e:
    print("raw head:\n", data[:2000], flush=True)
