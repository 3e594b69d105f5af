"""Smith-Waterman kernel correctness vs the NumPy golden model."""

import numpy as np
import pytest

from unicore_tpu.matrices import BLOSUM62, default_3di_matrix
from unicore_tpu.ops.sw import build_scores, sw_forward_pallas, sw_forward_xla
from unicore_tpu.ops.sw_ref import sw_forward_ref, sw_traceback_ref

RNG = np.random.RandomState(7)
GO, GE = 28.0, 3.0


def _random_pairs(B, Lq, Lt, minlen=10):
    qa = RNG.randint(0, 20, size=(B, Lq)).astype(np.int32)
    qs = RNG.randint(0, 20, size=(B, Lq)).astype(np.int32)
    ta = RNG.randint(0, 20, size=(B, Lt)).astype(np.int32)
    ts = RNG.randint(0, 20, size=(B, Lt)).astype(np.int32)
    qlen = RNG.randint(minlen, Lq + 1, size=B).astype(np.int32)
    tlen = RNG.randint(minlen, Lt + 1, size=B).astype(np.int32)
    # plant homology in half the pairs: copy a window of q into t
    for b in range(0, B, 2):
        w = min(qlen[b], tlen[b], 40)
        qa[b, :w] = ta[b, :w]
        qs[b, :w] = ts[b, :w]
    return qa, qs, ta, ts, qlen, tlen


def _ref_ends(scores, qlen, tlen):
    out = []
    for b in range(scores.shape[0]):
        s = scores[b, : qlen[b], : tlen[b]]
        out.append(sw_forward_ref(s, GO, GE))
    return out


def test_xla_backend_matches_numpy():
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 64, 96)
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    best, bi, bj = sw_forward_xla(scores, go=GO, ge=GE)
    best, bi, bj = np.array(best), np.array(bi), np.array(bj)
    for b, (rb, ri, rj) in enumerate(_ref_ends(scores, qlen, tlen)):
        assert best[b] == pytest.approx(rb), f"pair {b} score"
        if rb > 0:
            assert (bi[b], bj[b]) == (ri, rj), f"pair {b} end"


def test_pallas_interpret_matches_numpy():
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    # Lq=256 with block_rows=128 exercises the 2-row-block scratch
    # persistence path under the interpreter
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 256, 128)
    best, bi, bj = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, block_rows=128, batch_tile=8, interpret=True,
    )
    best, bi, bj = np.array(best), np.array(bi), np.array(bj)
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    for b, (rb, ri, rj) in enumerate(_ref_ends(scores, qlen, tlen)):
        assert best[b] == pytest.approx(rb), f"pair {b} score"
        if rb > 0:
            assert (bi[b], bj[b]) == (ri, rj), f"pair {b} end"


def test_pallas_interpret_seg1():
    """Unsegmented (SEG=1) kernel path under the interpreter."""
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 64, 256)
    best, bi, bj = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=8, interpret=True, segments=1,
    )
    best, bi, bj = np.array(best), np.array(bi), np.array(bj)
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    for b, (rb, ri, rj) in enumerate(_ref_ends(scores, qlen, tlen)):
        assert best[b] == pytest.approx(rb), f"pair {b} score"
        if rb > 0:
            assert (bi[b], bj[b]) == (ri, rj), f"pair {b} end"


def test_traceback_consistent_with_forward():
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(6, 48, 48)
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    for b in range(6):
        s = scores[b, : qlen[b], : tlen[b]].astype(np.float64)
        fb, fi, fj = sw_forward_ref(s, GO, GE)
        score, q0, q1, t0, t1, q_arr, t_arr = sw_traceback_ref(s, GO, GE)
        assert score == pytest.approx(fb)
        if fb > 0:
            assert (q1, t1) == (fi, fj)
            assert q0 <= q1 and t0 <= t1
            # alignment indices are monotone and within bounds
            qv = q_arr[q_arr >= 0]
            tv = t_arr[t_arr >= 0]
            assert (np.diff(qv) == 1).all()
            assert (np.diff(tv) == 1).all()


def test_identical_sequences_high_score():
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    L = 64
    a = RNG.randint(0, 20, size=L).astype(np.int32)
    s = RNG.randint(0, 20, size=L).astype(np.int32)
    qa = a[None, :]
    qs = s[None, :]
    scores = build_scores(
        qa, qs, qa.copy(), qs.copy(),
        np.array([L], np.int32), np.array([L], np.int32), saa, s3d,
    )
    best, bi, bj = sw_forward_xla(scores, go=GO, ge=GE)
    # self alignment: ends at the last cell, score = sum of diagonal scores
    expected = float(sum(4 * saa[a[i], a[i]] + 6 * s3d[s[i], s[i]] for i in range(L)))
    assert float(best[0]) == pytest.approx(expected)
    assert (int(bi[0]), int(bj[0])) == (L - 1, L - 1)


@pytest.mark.parametrize("kw", [{"chains": 2}, {"dp_dtype": "i16"},
                                {"chains": 2, "dp_dtype": "i16"}])
def test_pallas_variants_bit_exact(kw):
    """Interleaved chains and int16 DP are exact reformulations."""
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(16, 128, 128)
    base = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=16, interpret=True,
    )
    var = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=16, interpret=True, **kw,
    )
    for a, b in zip(base, var):
        assert (np.array(a) == np.array(b)).all()


def test_pallas_gap_window_interpret():
    """Windowed scan equals full scan when no optimal gap exceeds it."""
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 128, 128)
    full = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=8, interpret=True,
    )
    win = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=8, interpret=True, gap_window=64,
    )
    for a, b in zip(full, win):
        assert (np.array(a) == np.array(b)).all()
