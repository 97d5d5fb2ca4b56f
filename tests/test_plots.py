"""Training-curve plotting from the MetricsWriter JSONL."""

import json
import os

from tubelet_transformer_tpu.plots import load_metrics, plot_training


def _write_jsonl(path):
    rows = []
    for step in range(5):
        rows.append({"tag": "train/total_loss", "value": 10.0 / (step + 1),
                     "step": step, "ts": 0.0})
        rows.append({"tag": "learning_rate", "value": 1e-4, "step": step,
                     "ts": 0.0})
    rows.append({"tag": "val/val_mAP_epoch", "value": 0.3, "step": 0,
                 "ts": 0.0})
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_load_and_plot(tmp_path):
    jl = tmp_path / "metrics.jsonl"
    _write_jsonl(jl)
    series = load_metrics(str(jl))
    assert series["train/total_loss"][0] == list(range(5))
    out = plot_training(str(jl), str(tmp_path / "curves.png"))
    assert os.path.getsize(out) > 1000

    # experiment-dir resolution (tb_log/metrics.jsonl)
    d = tmp_path / "exp" / "tb_log"
    d.mkdir(parents=True)
    _write_jsonl(d / "metrics.jsonl")
    assert "learning_rate" in load_metrics(str(tmp_path / "exp"))
