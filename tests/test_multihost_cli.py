"""Multi-host launch path: the PRODUCTION CLI under 2-process jax.distributed.

Drives `python -m nasrec_tpu.cli.main_train --num_processes 2 --mesh_model 2`
across real OS-process boundaries (gloo CPU collectives, 4 virtual devices
each) and asserts the printed train/test trajectory equals a single-process
run of the identical global configuration — the end-to-end proof that the
multi-host flags (cli/common.py), jax.distributed bring-up, per-process
global-batch assembly (workloads._globalize_iterators), cross-process metric
gathers (parallel.distributed.fetch_array) and the dp+tp step compose.

Runs in subprocesses with their own env (the in-process conftest CPU mesh is
irrelevant here).  Slowest test in the suite (~3-5 min of CPU jit compiles,
3 concurrent processes); the assertion lives in tools/multihost_demo.main.
"""

import os
import subprocess
import sys


def test_multihost_cli_matches_single_process():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "nasrec_tpu.tools.multihost_demo"],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "MULTIHOST_OK" in proc.stdout, proc.stdout
