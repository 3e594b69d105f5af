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
                                {"chains": 2, "dp_dtype": "i16", "batch_tile": 32}])
def test_pallas_variants_bit_exact(kw):
    """Interleaved chains and int16 DP are exact reformulations.

    i16 + chains requires a 16-aligned sublane slice per chain
    ((BT//chains) % 16 == 0, the int16 native tile), hence batch_tile=32
    for the combined case.
    """
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(32, 128, 128)
    base = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=16, interpret=True,
    )
    kw = dict(kw)
    bt = kw.pop("batch_tile", 16)
    var = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=bt, interpret=True, **kw,
    )
    for a, b in zip(base, var):
        assert (np.array(a) == np.array(b)).all()


def _ungapped_ref(s):
    """NumPy Kadane over every diagonal: max gap-free segment score.
    Ties break row-major (lowest (i, j)), like the kernels."""
    Lq, Lt = s.shape
    H = np.zeros((Lq, Lt))
    for i in range(Lq):
        for j in range(Lt):
            diag = H[i - 1, j - 1] if (i > 0 and j > 0) else 0.0
            H[i, j] = max(0.0, diag + s[i, j])
    best = H.max()
    bi, bj = np.unravel_index(np.argmax(H), H.shape)  # row-major argmax
    return best, int(bi), int(bj)


def test_ungapped_xla_matches_numpy():
    from unicore_tpu.ops.sw import ungapped_forward_xla

    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 48, 64)
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    best, bi, bj = map(np.array, ungapped_forward_xla(scores))
    for b in range(8):
        rb, ri, rj = _ungapped_ref(scores[b, : qlen[b], : tlen[b]].astype(np.float64))
        assert best[b] == pytest.approx(rb), f"pair {b}"
        if rb > 0:
            assert (bi[b], bj[b]) == (ri, rj), f"pair {b} end"


def test_pallas_ungapped_interpret():
    """Pallas ungapped mode == XLA ungapped reference (scores and ends)."""
    from unicore_tpu.ops.sw import ungapped_forward_xla

    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 128, 128)
    best, bi, bj = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=8, interpret=True, ungapped=True,
    )
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    xb, xi, xj = map(np.array, ungapped_forward_xla(scores))
    assert (np.array(best) == xb).all()
    pos = xb > 0
    assert (np.array(bi)[pos] == xi[pos]).all()
    assert (np.array(bj)[pos] == xj[pos]).all()


def test_gap_window_same_algorithm_both_backends():
    """The windowed-gap recurrence is one algorithm on both backends:
    XLA scan with gap_window == Pallas kernel with gap_window (the
    engine's cross-backend byte-identical-output contract)."""
    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 128, 128)
    pal = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=8, interpret=True, gap_window=64,
    )
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d)
    xla = sw_forward_xla(scores, go=GO, ge=GE, gap_window=64)
    for a, b in zip(pal, xla):
        a, b = np.array(a), np.array(b)
        pos = np.array(pal[0]) > 0
        assert (a[pos] == b[pos]).all()


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


def test_pallas_bias_interpret_matches_xla():
    """The composition-bias MXU row (qc input) produces exactly
    build_scores(qc)+scan on every path: gapped, windowed, ungapped."""
    from unicore_tpu.ops.sw import ungapped_forward_xla

    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 128, 128)
    rng = np.random.RandomState(7)
    qc = rng.randint(-150, 40, qa.shape).astype(np.int32)
    scores = build_scores(qa, qs, ta, ts, qlen, tlen, saa, s3d, qc=qc)
    for ungapped in (False, True):
        if ungapped:
            ref = ungapped_forward_xla(scores)
        else:
            ref = sw_forward_xla(scores, go=GO, ge=GE, gap_window=64)
        pal = sw_forward_pallas(
            qa, qs, ta, ts, qlen, tlen, saa, s3d,
            go=GO, ge=GE, batch_tile=8, interpret=True,
            gap_window=0 if ungapped else 64, ungapped=ungapped, qc=qc,
        )
        for a, b in zip(ref, pal):
            assert (np.array(a) == np.array(b)).all(), ungapped


def test_pallas_bias_exact_at_clip_bound():
    """Kernel exactness at the composition-bias clip bound: with qc at
    exactly +-bias_clip_bound (the largest magnitude composition_bias
    can emit), the bf16-score-scratch Pallas path must stay bit-exact
    vs the INTEGER NumPy golden model — the cross-backend byte-identity
    contract the bound exists to protect (a +-255 clip measurably broke
    it by up to 14 score units)."""
    from unicore_tpu.align.bias import bias_clip_bound

    saa = BLOSUM62.astype(np.float32)
    s3d = default_3di_matrix().astype(np.float32)
    w_aa, w_3di = 4.0, 6.0
    bound = int(bias_clip_bound(saa, s3d, w_aa, w_3di))
    assert bound > 0
    qa, qs, ta, ts, qlen, tlen = _random_pairs(8, 128, 128)
    rng = np.random.RandomState(11)
    qc = rng.choice([-bound, bound], size=qa.shape).astype(np.int32)
    # integer golden score matrix (float64 — exact for these magnitudes)
    best, bi, bj = sw_forward_pallas(
        qa, qs, ta, ts, qlen, tlen, saa, s3d,
        go=GO, ge=GE, batch_tile=8, interpret=True, qc=qc,
    )
    best, bi, bj = np.array(best), np.array(bi), np.array(bj)
    for b in range(qa.shape[0]):
        s = (w_aa * saa[qa[b, : qlen[b], None], ta[b, None, : tlen[b]]]
             + w_3di * s3d[qs[b, : qlen[b], None], ts[b, None, : tlen[b]]]
             ).astype(np.float64) + qc[b, : qlen[b], None]
        assert np.abs(s).max() <= 256.0
        rb, ri, rj = sw_forward_ref(s, GO, GE)
        assert best[b] == rb, f"pair {b} score"
        if rb > 0:
            assert (bi[b], bj[b]) == (ri, rj), f"pair {b} end"
