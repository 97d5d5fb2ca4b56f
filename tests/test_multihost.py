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


def test_two_process_preemption_and_resume(tmp_path):
    """SIGTERM delivered to ONLY ONE host must stop BOTH cleanly: the
    epoch-boundary allgather makes the save/stop decision collective, so
    the un-signaled host joins the checkpoint save instead of deadlocking
    in mismatched collectives. The relaunch then resumes both hosts from
    rank 0's broadcast checkpoint choice."""
    import re
    import signal
    import time

    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    def _launch(epochs, load):
        port = _free_port()
        return [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(port), str(tmp_path),
                 str(epochs), "1" if load else "0"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
                text=True)
            for pid in range(2)
        ]

    # Phase 1: long run (200 epochs would exceed any timeout — only the
    # preemption path can end it early).
    procs = _launch(epochs=200, load=False)
    # wait for steady state: one committed checkpoint on disk
    deadline = time.time() + 900
    while time.time() < deadline:
        if glob.glob(str(tmp_path / "*" / "checkpoints" / "ckpt_epoch_*")):
            break
        if any(p.poll() is not None for p in procs):
            break
        time.sleep(1.0)
    time.sleep(1.0)
    procs[0].send_signal(signal.SIGTERM)     # host 0 ONLY
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MH_WORKER_OK pid={pid}" in out
        assert "preempted: checkpointed epoch" in out, out[-2000:]
    m = re.search(r"preempted: checkpointed epoch (\d+)", outs[0])
    stopped = int(m.group(1))
    assert stopped < 199       # stopped early, not by exhausting epochs

    # Phase 2: resume. Both hosts must adopt the SAME checkpoint (rank 0's
    # choice is broadcast) and run the remaining epochs to completion.
    procs = _launch(epochs=stopped + 2, load=True)
    outs = [p.communicate(timeout=900)[0] for p in procs]
    resumed = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MH_WORKER_OK pid={pid}" in out
        m = re.search(r"resumed from (\S+) at epoch (\d+)", out)
        assert m, out[-2000:]
        resumed.append(m.groups())
    assert resumed[0] == resumed[1]          # identical path + epoch
    assert int(resumed[0][1]) == stopped + 1
