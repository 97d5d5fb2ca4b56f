"""CLI: pack an AVA split into pre-decoded clip shards (data/packed.py).

Usage:
  python -m tubelet_transformer_tpu.cli.pack_data \
      --config-file <yaml> --split train --out /data/ava_packed_train

Then set ``DATA.PACKED_PATH: /data/ava_packed_{}`` (the ``{}`` receives the
split) to train/eval without any JPEG decode in the hot path.
"""

import argparse
import os

from tubelet_transformer_tpu.config import load_config


def main() -> None:
    p = argparse.ArgumentParser(
        description="Pack AVA clips into pre-decoded shards")
    p.add_argument("--config-file", required=True)
    p.add_argument("--split", choices=("train", "val"), default="train")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None,
                   help="pack only the first N keyframes (smoke runs)")
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1,
                   help="decode threads (native decode releases the GIL)")
    args = p.parse_args()

    from tubelet_transformer_tpu.data.packed import pack_ava, pack_jhmdb

    cfg = load_config(args.config_file)
    packer = (pack_jhmdb if cfg.data.dataset_name in ("jhmdb", "ucf")
              else pack_ava)
    out = packer(cfg, args.split, args.out, limit=args.limit,
                 workers=args.workers)
    print(f"packed {args.split} split to {out}")


if __name__ == "__main__":
    main()
