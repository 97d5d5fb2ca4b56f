"""Worker for the 2-process multi-host simulation test.

Usage: python tests/_mh_worker.py <pid> <port> <tmpdir> [epochs] [load]
Each process owns 4 virtual CPU devices; the global mesh is 8-wide 'data'.
Runs ``epochs`` (default 1) of synthetic training + validation through the
real runner (per-host loader shards, global-batch assembly, gathered
evaluation); ``load=1`` resumes from the newest checkpoint under tmpdir
(the rank-0-broadcast resume path).
"""

import os
import sys


def main() -> None:
    pid, port, tmpdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    load = len(sys.argv) > 5 and sys.argv[5] == "1"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tubelet_transformer_tpu.config import Config
    from tubelet_transformer_tpu.cli import runner

    cfg = Config()
    cfg.data.dataset_name = "synthetic"
    cfg.data.num_classes = 5
    cfg.data.max_boxes = 4
    cfg.data.img_size = 32
    cfg.data.temp_len = 8
    cfg.data.num_workers = 2
    cfg.data.synthetic_size = 8
    cfg.model.backbone_name = "CSN-TINY"
    cfg.model.query_num = 5
    cfg.model.temp_len = 8
    cfg.model.enc_layers = 1
    cfg.model.dec_layers = 2
    cfg.model.d_model = 64
    cfg.model.nhead = 4
    cfg.model.dim_feedforward = 64
    cfg.model.compute_dtype = "float32"
    cfg.model.temporal_ds_strategy = "avg"
    cfg.train.batch_size = 1       # per chip -> global batch 4
    cfg.train.epoch_num = epochs
    cfg.model.load = load
    cfg.val.batch_size = 1
    cfg.val.freq = 1 if epochs == 1 else 1000   # preempt runs skip validate
    cfg.log.base_path = tmpdir
    cfg.log.display_freq = 1

    runner.run_training(cfg)
    print(f"MH_WORKER_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
