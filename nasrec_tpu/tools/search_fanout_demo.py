"""Cross-process EA fan-out: the PRODUCTION search CLI under 2 processes.

Drives `python -m nasrec_tpu.cli.eval_subnet_from_supernet --num_processes 2
--process_id {0,1}` over gloo CPU collectives and asserts the search history
(results.pickle, written by process 0) is IDENTICAL to a single-process run
of the same configuration — the proof that candidate-group fan-out
(search/evolution.py::Searcher._evaluate_distributed) keeps the seeded
search loop in lockstep: groups round-robin across processes, one
process_allgather exchanges the float metrics, every process reconstructs
the same result list, so sampling / mutation / dedup / aging all match.

This is the scale-out half of SURVEY §2.9's search parallelism (the vmapped
on-device group is the other half); the reference fans candidates out as
one mp.Process per GPU (ref: nasrec/searcher/searcher.py:126-156,
searcher_utils.py:40-126).

Run (spawns all workers itself):
  python -m nasrec_tpu.tools.search_fanout_demo
Prints SEARCH_FANOUT_OK on success.
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile

COORD = "127.0.0.1:23553"
CLI = [
    "-m", "nasrec_tpu.cli.eval_subnet_from_supernet",
    "--data_source", "synthetic", "--config", "autoctr", "--num_blocks", "3",
    "--method", "regularized-ea",
    "--n_generations", "3", "--n_childs", "2", "--init_population", "6",
    "--sample_size", "2", "--ea_top_k", "1", "--group_size", "2",
    "--max_train_steps", "6", "--max_eval_steps", "2",
    "--train_batch_size", "64", "--test_batch_size", "128",
    "--seed", "3",
]


def _env(devices: int = 2) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices}"
    ).strip()
    return env


def _run_pair(out_dir: str):
    dist = ["--num_processes", "2", "--coordinator_address", COORD]
    env = _env()
    procs = [
        subprocess.Popen(
            [sys.executable] + CLI + dist
            + ["--process_id", str(i), "--logging_dir", out_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    bad = [p.returncode for p in procs if p.returncode != 0]
    if bad:
        raise SystemExit("fanout pair failed:\n" + "\n---\n".join(outs))
    return outs


def _run_single(out_dir: str) -> str:
    proc = subprocess.run(
        [sys.executable] + CLI + ["--logging_dir", out_dir],
        env=_env(), capture_output=True, text=True, timeout=900,
    )
    if proc.returncode != 0:
        raise SystemExit(f"single run failed:\n{proc.stdout}\n{proc.stderr}")
    return proc.stdout


def _history(out_dir: str):
    with open(os.path.join(out_dir, "results.pickle"), "rb") as f:
        results = pickle.load(f)
    with open(os.path.join(out_dir, "all_results.pickle"), "rb") as f:
        all_results = pickle.load(f)
    return results, all_results


def main():
    base = tempfile.mkdtemp(prefix="nasrec_fanout_")
    d_single = os.path.join(base, "single")
    d_multi = os.path.join(base, "multi")
    _run_single(d_single)
    _run_pair(d_multi)

    res_s, all_s = _history(d_single)
    res_m, all_m = _history(d_multi)
    assert len(all_s) == len(all_m) and len(all_s) > 0, (len(all_s), len(all_m))
    for a, b in zip(all_s + res_s, all_m + res_m):
        # The search TRAJECTORY (which architectures were proposed, in which
        # order — i.e. every sampling / mutation / dedup / aging decision)
        # must be identical.  The float metrics agree only to XLA
        # f32-accumulation noise: bringing up jax.distributed changes the
        # CPU client's compilation enough to perturb reductions ~1e-8 even
        # for groups evaluated on process 0 (measured), so exact equality
        # is the wrong contract — same tolerance stance as multihost_demo.
        assert a["choice"] == b["choice"], (a["choice"], b["choice"])
        for f in ("test_loss", "test_acc", "test_auroc"):
            assert abs(a[f] - b[f]) <= 1e-5 * max(1.0, abs(a[f])), (
                f, a[f], b[f]
            )
    print(f"SEARCH_FANOUT_OK candidates={len(all_s)} "
          f"best={res_s[0]['test_loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
