"""Two-process multi-host simulation: the full training runner over a
2-host x 4-device virtual CPU mesh — per-host loader shards, global batch
assembly (make_array_from_process_local_data), XLA-collective gradient
sync, gathered validation, rank-0 logging/checkpointing.

The reference's analog is mp.spawn + NCCL DDP + filesystem rank exchange
(pipelines/launch.py, SURVEY §2.8); here the whole path runs through
jax.distributed with real OS processes.
"""

import glob
import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1700)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MH_WORKER_OK pid={pid}" in out

    # rank 0 wrote metrics (incl. validation mAP) and a checkpoint
    logs = glob.glob(str(tmp_path / "*" / "tb_log" / "metrics.jsonl"))
    assert logs, outs[0][-2000:]
    tags = {json.loads(line)["tag"] for line in open(logs[0])}
    assert "train/total_loss" in tags
    assert "val/val_mAP_epoch" in tags
    assert glob.glob(str(tmp_path / "*" / "checkpoints" / "ckpt_epoch_*"))
