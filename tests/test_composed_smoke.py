"""Fast-tier composed-pipeline smoke (round-2 VERDICT weak #5): the
headline accuracy-parity claim — the reference's FULL torch eval path and
our FULL jitted path agree on shared fixtures with converted weights —
verified cheaply every `make test-fast` run, not only in the ~55-min slow
tier. Reduced fixture (2 keyframes instead of 4); the full matrix
(decode/packed/host-preprocess, JHMDB, LFB) lives in
tests/test_composed_pipeline.py.
"""

import numpy as np

from test_composed_pipeline import (
    _cpu_torch,  # noqa: F401  (fixture)
    _labelmap,
    _make_fixture,
    _our_ava_cfg,
    _our_ava_map,
    _ref_ava_map,
    _shared_ava_weights,
    _assert_parity,
)


def test_composed_eval_parity_smoke(tmp_path, rng, _cpu_torch):  # noqa: F811
    np.int = int
    np.float = np.float64
    np.NAN = np.nan

    frames_dir = _make_fixture(tmp_path, rng, n_keys=2)
    label_path = _labelmap(tmp_path)
    ref, params, batch_stats = _shared_ava_weights("avg")
    ref_map, ref_person = _ref_ava_map(tmp_path, ref, label_path, frames_dir)
    cfg = _our_ava_cfg(tmp_path, "avg", label_path)
    result = _our_ava_map(cfg, params, batch_stats, label_path)
    _assert_parity(result, ref_map, ref_person)
