"""Two-process multi-host drive of the PRODUCTION training CLI.

Validates the multi-host launch path end-to-end without TPU pod hardware:
two OS processes run `python -m nasrec_tpu.cli.main_train --num_processes 2
--process_id {0,1} --mesh_model 2 ...` over gloo CPU collectives (4 virtual
devices each -> a global 8-device (data=4, model=2) mesh), and the printed
training trajectory of process 0 is asserted equal to a SINGLE-process run
of the identical global configuration (one process, 8 virtual devices).

This exercises the full production stack across real process boundaries:
jax.distributed bring-up from CLI flags (cli/common.py), per-process global
batch assembly (workloads._globalize_iterators +
jax.make_array_from_process_local_data), the dp+tp sparse train step with
its cross-process all_gather, multi-process metric fetches
(parallel.distributed.fetch_array), and the end-of-run param gather.

The reference has no distributed analogue (SURVEY.md §2.9 — it is
single-process/single-GPU, ref: nasrec/main_train.py:282); this is the
BASELINE north-star launch path (config #5: >= 2 hosts).

Run (spawns all workers itself):
  python -m nasrec_tpu.tools.multihost_demo
Prints MULTIHOST_OK on success.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

COORD = "127.0.0.1:23519"
STEPS = 12
CLI_ARGS = [
    "-m", "nasrec_tpu.cli.main_train",
    "--net", "supernet-config", "--arch", "criteo-kaggle/xlarge",
    "--data_source", "synthetic",
    "--train_batch_size", "64", "--test_batch_size", "64",
    "--max_train_steps", str(STEPS), "--display_interval", "3",
    "--test_interval", "6", "--max_eval_steps", "2",
    "--learning_rate", "0.05", "--mesh_model", "2",
]


def _env(devices: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices}"
    ).strip()
    return env


def _losses(out: str):
    """Parse (train losses, test losses) from the CLI's printed trajectory."""
    train = [float(m) for m in re.findall(r"step \d+ loss ([0-9.]+)", out)]
    test = [float(m) for m in re.findall(r"TEST .* loss ([0-9.]+)", out)]
    return train, test


def main():
    # All three processes (1x single-process reference + the 2-process gloo
    # pair) run CONCURRENTLY — the wall time is dominated by CPU jit
    # compiles, which are independent.
    dist = ["--num_processes", "2", "--coordinator_address", COORD]
    menv = _env(4)
    procs = {
        "single": subprocess.Popen(
            [sys.executable] + CLI_ARGS, env=_env(8),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ),
        "proc1": subprocess.Popen(
            [sys.executable] + CLI_ARGS + dist + ["--process_id", "1"],
            env=menv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ),
        "proc0": subprocess.Popen(
            [sys.executable] + CLI_ARGS + dist + ["--process_id", "0"],
            env=menv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ),
    }
    outs = {k: p.communicate(timeout=900)[0] for k, p in procs.items()}
    bad = {k: p.returncode for k, p in procs.items() if p.returncode != 0}
    if bad:
        detail = "\n".join(f"--- {k} ---\n{outs[k]}" for k in outs)
        raise SystemExit(f"runs failed {bad}:\n{detail}")

    single_train, single_test = _losses(outs["single"])
    multi_train, multi_test = _losses(outs["proc0"])
    assert len(single_train) >= 3 and len(single_test) >= 2, (
        single_train, single_test
    )
    assert len(single_train) == len(multi_train), (single_train, multi_train)
    assert len(single_test) == len(multi_test), (single_test, multi_test)
    # gloo vs shared-memory collectives may reorder f32 reductions; the
    # trajectories must agree to float-accumulation noise.
    for a, b in zip(single_train + single_test, multi_train + multi_test):
        assert abs(a - b) <= 1e-4 * max(1.0, abs(a)), (
            (single_train, single_test), (multi_train, multi_test)
        )
    print(
        "MULTIHOST_OK train=" + repr([f"{l:.6f}" for l in multi_train])
        + " test=" + repr([f"{l:.6f}" for l in multi_test]),
        flush=True,
    )


if __name__ == "__main__":
    main()
