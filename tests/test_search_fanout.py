"""Cross-process EA candidate fan-out: the PRODUCTION search CLI under
2-process jax.distributed (gloo CPU collectives) must explore the identical
architecture trajectory as a single-process run of the same seed, with
metrics equal to float-accumulation noise — the scale-out half of SURVEY
§2.9's search parallelism (ref analogue: one mp.Process per GPU,
nasrec/searcher/searcher.py:126-156).

Runs in subprocesses with their own env (the in-process conftest CPU mesh
is irrelevant here); the assertions live in tools/search_fanout_demo.main.
"""

import os
import subprocess
import sys


def test_search_fanout_matches_single_process():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "nasrec_tpu.tools.search_fanout_demo"],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "SEARCH_FANOUT_OK" in proc.stdout, proc.stdout
