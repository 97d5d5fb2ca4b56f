"""CLI: generate the long-term feature bank over the val split.

Usage: python -m tubelet_transformer_tpu.cli.generate_lfb --config-file <yaml>
(reference GENERATE_LFB hook — tuber_jhmdb.py:112 references a missing
forward_lfb_locations; this is the working implementation.)
"""

from tubelet_transformer_tpu.cli.runner import main

if __name__ == "__main__":
    main("generate-lfb", "ava")
