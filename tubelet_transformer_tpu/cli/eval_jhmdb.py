"""CLI: eval on jhmdb (reference eval_tuber_jhmdb.py equivalent).

Usage: python -m tubelet_transformer_tpu.cli.eval_jhmdb --config-file <yaml>
"""

from tubelet_transformer_tpu.cli.runner import main

if __name__ == "__main__":
    main("eval", "jhmdb")
