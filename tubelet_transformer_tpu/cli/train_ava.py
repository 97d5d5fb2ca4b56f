"""CLI: train on ava (reference train_tuber_ava.py equivalent).

Usage: python -m tubelet_transformer_tpu.cli.train_ava --config-file <yaml>
"""

from tubelet_transformer_tpu.cli.runner import main

if __name__ == "__main__":
    main("train", "ava")
