"""Multi-process (multi-host analogue) smoke tests over real
jax.distributed + Gloo CPU collectives (VERDICT round-1 items #5/#10).

Each test launches 2 coordinator-connected subprocesses — the TPU-native
equivalent of the reference's DDP ranks — and checks:
* ``all_sum_host`` reduces shard-local confusion matrices globally
  (reference prediction_writer.py:68-87 all_gather + rank-0 sum),
* rank gating: only process 0 persists metrics.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])

_WORKER = """
import os, sys, json
idx = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                           num_processes=2, process_id=idx)
import numpy as np
from flair_for_aigle_tpu.parallel.dist import all_sum_host, is_rank_zero
from flair_for_aigle_tpu.writer.prediction_writer import PredictionWriter

config = {{
    "labels": ["T"],
    "labels_configs": {{"T": {{"value_name": ["a", "b", "c"]}}}},
    "paths": {{"out_model_name": "m"}},
    "tasks": {{"write_files": False}},
    "modalities": {{"inputs": {{}}}},
}}
writer = PredictionWriter(config, output_dir=out_dir)
# shard-local confmat: rank r contributes (r+1) everywhere
writer.accumulated_confmats["T"] = np.full((3, 3), idx + 1, np.int64)
writer.on_predict_epoch_end()
total = writer.accumulated_confmats["T"]
assert (total == 3).all(), total
assert is_rank_zero() == (idx == 0)
print("WORKER_OK", idx, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_predict_confmat_reduction(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out

    # rank 0 (and only rank 0) persisted globally-reduced metrics
    metrics_file = tmp_path / "metrics_m" / "T" / "metrics.json"
    assert metrics_file.exists()
    metrics = json.loads(metrics_file.read_text())
    assert "Avg_metrics" in metrics
