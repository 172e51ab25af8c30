"""Greedy assignment parity vs the reference tracker's matching semantics."""

import numpy as np
import pytest

from ysmr_tpu.ops import assignment as asg


def golden_greedy(distance_matrix):
    """Reference-semantics matcher (tracker.py:158-189), independent numpy code.

    rows sorted by their row-minimum (stable), each row's candidate column is
    its full-row argmin; first-come matching skips rows whose candidate
    column is taken.
    """
    rows = np.argsort(distance_matrix.min(axis=1), kind='stable')
    cols = distance_matrix.argmin(axis=1)[rows]
    used_rows, used_cols = set(), set()
    row_to_col = np.full(distance_matrix.shape[0], -1, np.int64)
    for row, col in zip(rows, cols):
        if row in used_rows or col in used_cols:
            continue
        row_to_col[row] = col
        used_rows.add(row)
        used_cols.add(col)
    return row_to_col


@pytest.mark.parametrize('r,c', [(5, 5), (8, 3), (3, 8), (1, 1), (6, 1), (1, 6)])
def test_greedy_matches_golden(rng, r, c):
    for _ in range(20):
        d = rng.uniform(0, 100, (r, c))
        res = asg.greedy_assign(np.float32(d), np.ones(r, bool), np.ones(c, bool))
        got = np.asarray(res['row_to_col'])
        want = golden_greedy(d.astype(np.float32))
        assert got.tolist() == want.tolist()
        matched_cols = set(got[got >= 0].tolist())
        assert np.asarray(res['col_matched']).nonzero()[0].tolist() == sorted(matched_cols)


def test_greedy_contested_column(rng):
    # two rows both nearest to column 0: closer row wins, loser is skipped
    # entirely even though column 1 is free (reference semantics, no re-match)
    d = np.array([[1.0, 50.0], [2.0, 60.0], [100.0, 3.0]], np.float32)
    res = asg.greedy_assign(d, np.ones(3, bool), np.ones(2, bool))
    assert np.asarray(res['row_to_col']).tolist() == [0, -1, 1]


def test_greedy_padded_slots(rng):
    # invalid rows/cols (padding) must never match
    d = np.full((6, 6), asg.BIG, np.float32)
    d[:3, :2] = rng.uniform(0, 10, (3, 2)).astype(np.float32)
    obj_valid = np.array([True, True, True, False, False, False])
    det_valid = np.array([True, True, False, False, False, False])
    res = asg.greedy_assign(d, obj_valid, det_valid)
    got = np.asarray(res['row_to_col'])
    assert (got[3:] == -1).all()
    assert (got[:3] < 2).all()
    want = golden_greedy(d[:3, :2])
    assert got[:3].tolist() == want.tolist()


def test_pairwise_distances_luminosity():
    obj = np.array([[0.0, 0.0, 1.0], [3.0, 4.0, 0.5]], np.float32)
    det = np.array([[0.0, 0.0, 0.0]], np.float32)
    d = np.asarray(asg.pairwise_distances(obj, np.ones(2, bool), det, np.ones(1, bool)))
    assert d[0, 0] == pytest.approx(1.0)
    assert d[1, 0] == pytest.approx(np.sqrt(25.25))
