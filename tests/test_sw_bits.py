"""Batched device SW traceback (ops/sw_bits.py) vs the NumPy golden
model (ops/sw_ref.py) — paths must be bit-identical, including every
tie decision (the m8 fill contract, search.rs:56-61)."""

import numpy as np

from unicore_tpu.ops.sw_bits import sw_traceback_batch
from unicore_tpu.ops.sw_ref import sw_traceback_ref


def _random_windows(n=24, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        L1 = rng.randint(3, 90)
        L2 = rng.randint(3, 90)
        # integer scores with a positive-planted diagonal so most
        # windows carry real alignments (plus some all-negative ones)
        S = rng.randint(-60, 25, (L1, L2))
        if rng.rand() < 0.8:
            d = min(L1, L2)
            S[np.arange(d), np.arange(d)] += rng.randint(20, 80, d)
        out.append(S.astype(np.int32))
    return out


def test_paths_match_numpy_reference():
    windows = _random_windows()
    go, ge = 100, 10
    got = sw_traceback_batch(windows, go, ge)
    for S, (q_arr, t_arr, score) in zip(windows, got):
        rs, _, _, _, _, rq, rt = sw_traceback_ref(S.astype(np.float64), go, ge)
        assert score == rs, (score, rs)
        assert np.array_equal(q_arr, rq)
        assert np.array_equal(t_arr, rt)


def test_empty_and_degenerate_windows():
    go, ge = 100, 10
    res = sw_traceback_batch(
        [np.zeros((0, 5), np.int32),
         np.full((4, 4), -50, np.int32),
         np.array([[70]], np.int32)],
        go, ge,
    )
    assert len(res[0][0]) == 0
    assert len(res[1][0]) == 0 and res[1][2] == 0.0
    assert list(res[2][0]) == [0] and list(res[2][1]) == [0] and res[2][2] == 70.0


def test_gap_decisions_match():
    """Windows engineered to force E/F states and gap-open/extend ties."""
    go, ge = 30, 5
    rng = np.random.RandomState(3)
    windows = []
    for _ in range(12):
        L = rng.randint(10, 50)
        S = np.full((L, L + rng.randint(0, 20)), -10, np.int32)
        # two high-scoring diagonal segments offset by a gap
        d1 = rng.randint(3, 6)
        off = rng.randint(2, 8)
        for i in range(d1):
            S[i, i] = 50
        for i in range(d1, min(L, S.shape[1] - off)):
            S[i, i + off] = 50
        windows.append(S)
    got = sw_traceback_batch(windows, go, ge)
    for S, (q_arr, t_arr, score) in zip(windows, got):
        rs, _, _, _, _, rq, rt = sw_traceback_ref(S.astype(np.float64), go, ge)
        assert score == rs
        assert np.array_equal(q_arr, rq) and np.array_equal(t_arr, rt)
