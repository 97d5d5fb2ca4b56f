"""On-device Hungarian assignment vs scipy's linear_sum_assignment."""

import numpy as np
from scipy.optimize import linear_sum_assignment

from tubelet_transformer_tpu.ops import matcher


def _total_cost(cost, rows, cols):
    return float(cost[rows, cols].sum())


def test_square_matches_scipy(rng):
    for n in [1, 2, 5, 15, 32]:
        cost = rng.uniform(-10, 10, (4, n, n)).astype(np.float32)
        ours = np.asarray(matcher.solve_assignment(cost))
        for b in range(4):
            r, c = linear_sum_assignment(cost[b])
            ref_total = _total_cost(cost[b], r, c)
            our_total = _total_cost(cost[b], np.arange(n), ours[b])
            assert len(set(ours[b].tolist())) == n  # valid permutation
            np.testing.assert_allclose(our_total, ref_total, rtol=1e-5)


def test_rectangular_padding_matches_scipy(rng):
    """Padded-square solve == scipy rectangular solve on the valid block."""
    q, m_pad = 15, 32
    batch = 8
    cost = rng.uniform(-30, 30, (batch, q, m_pad)).astype(np.float32)
    n_valid = rng.integers(1, m_pad, batch)
    valid = np.arange(m_pad)[None, :] < n_valid[:, None]
    cost_masked = np.where(valid[:, None, :], cost, matcher.PAD_COST)

    tfq, qft = matcher.match(cost_masked, valid)
    tfq, qft = np.asarray(tfq), np.asarray(qft)

    for b in range(batch):
        nv = int(n_valid[b])
        r, c = linear_sum_assignment(cost[b, :, :nv])
        ref_total = _total_cost(cost[b], r, c)
        # our matched pairs
        qs = np.where(tfq[b] >= 0)[0]
        ts = tfq[b][qs]
        assert len(qs) == min(q, nv)
        our_total = _total_cost(cost[b], qs, ts)
        np.testing.assert_allclose(our_total, ref_total, rtol=1e-5, atol=1e-4)
        # inverse mapping consistent
        for qi, ti in zip(qs, ts):
            assert qft[b, ti] == qi


def test_match_all_invalid(rng):
    """A sample with zero valid targets must yield no matches."""
    q, m = 15, 8
    cost = np.full((1, q, m), matcher.PAD_COST, np.float32)
    valid = np.zeros((1, m), bool)
    tfq, qft = matcher.match(cost, valid)
    assert (np.asarray(tfq) == -1).all()
    assert (np.asarray(qft) == -1).all()


def test_more_targets_than_queries(rng):
    q, m = 4, 9
    cost = rng.uniform(0, 5, (2, q, m)).astype(np.float32)
    valid = np.ones((2, m), bool)
    tfq, qft = matcher.match(cost, valid)
    tfq, qft = np.asarray(tfq), np.asarray(qft)
    for b in range(2):
        r, c = linear_sum_assignment(cost[b])
        ref_total = _total_cost(cost[b], r, c)
        qs = np.where(tfq[b] >= 0)[0]
        assert len(qs) == q  # every query matched when targets abound
        our_total = _total_cost(cost[b], qs, tfq[b][qs])
        np.testing.assert_allclose(our_total, ref_total, rtol=1e-5, atol=1e-4)
