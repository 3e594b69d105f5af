"""Banded SW (ops/banded.py): diagonal voter, band scan vs full SW,
banded traceback, and engine routing for long pairs."""

import numpy as np
import pytest

from unicore_tpu.matrices import get_3di_matrix, get_aa_matrix
from unicore_tpu.ops.banded import (
    band_scores_ref,
    sw_forward_banded,
    sw_traceback_banded_ref,
    vote_diagonal,
)
from unicore_tpu.ops.sw import build_scores, sw_forward_xla, ungapped_forward_xla
from unicore_tpu.ops.sw_ref import sw_traceback_ref

GO, GE, W_AA, W_3DI = 28.0, 3.0, 4.0, 6.0


def _planted_pair(rng, L=300, shift=40, nmut=None, indels=3):
    """Target = shifted, mutated copy of the query with small indels.

    Returns (qa, qs, ta, ts, true_shift)."""
    qa = rng.randint(0, 20, L).astype(np.int32)
    qs = rng.randint(0, 20, L).astype(np.int32)
    ta = np.concatenate([rng.randint(0, 20, shift), qa.copy()]).astype(np.int32)
    ts = np.concatenate([rng.randint(0, 20, shift), qs.copy()]).astype(np.int32)
    nmut = nmut if nmut is not None else L // 12
    pos = rng.randint(shift, shift + L, nmut)
    ta[pos] = rng.randint(0, 20, nmut)
    for _ in range(indels):
        cut = rng.randint(shift + 10, len(ta) - 10)
        if rng.rand() < 0.5:
            ta = np.delete(ta, slice(cut, cut + 2))
            ts = np.delete(ts, slice(cut, cut + 2))
        else:
            ta = np.insert(ta, cut, rng.randint(0, 20, 2))
            ts = np.insert(ts, cut, rng.randint(0, 20, 2))
    return qa, qs, ta, ts, shift


def test_vote_diagonal_finds_planted_shift():
    rng = np.random.RandomState(7)
    for shift in (0, 25, 130):
        qa, qs, ta, ts, true = _planted_pair(rng, L=400, shift=shift)
        d = vote_diagonal(qa, qs, ta, ts)
        assert d is not None
        assert abs(d - true) <= 16, (d, true)


def test_vote_diagonal_none_for_junk():
    rng = np.random.RandomState(3)
    qa = rng.randint(0, 20, 200).astype(np.int32)
    qs = rng.randint(0, 20, 200).astype(np.int32)
    ta = rng.randint(0, 20, 200).astype(np.int32)
    ts = rng.randint(0, 20, 200).astype(np.int32)
    # random 6-mers over the 441-letter combined alphabet essentially
    # never collide at L=200
    assert vote_diagonal(qa, qs, ta, ts) is None


def _batchify(pairs, LQ, LT):
    B = len(pairs)
    qa = np.full((B, LQ), 20, np.int32)
    qs = np.full((B, LQ), 20, np.int32)
    ta = np.full((B, LT), 20, np.int32)
    ts = np.full((B, LT), 20, np.int32)
    ql = np.ones(B, np.int32)
    tl = np.ones(B, np.int32)
    d0 = np.zeros(B, np.int32)
    for i, (eqa, eqs, eta, ets, d) in enumerate(pairs):
        ql[i], tl[i] = len(eqa), len(eta)
        qa[i, : ql[i]] = eqa
        qs[i, : ql[i]] = eqs
        ta[i, : tl[i]] = eta
        ts[i, : tl[i]] = ets
        d0[i] = d
    return qa, qs, ta, ts, ql, tl, d0


@pytest.mark.parametrize("ungapped", [False, True])
def test_banded_matches_full_when_band_covers(ungapped):
    saa = get_aa_matrix().astype(np.float32)
    s3d = get_3di_matrix().astype(np.float32)
    rng = np.random.RandomState(11)
    pairs = []
    for shift in (0, 30, 90):
        qa, qs, ta, ts, _ = _planted_pair(rng, L=350, shift=shift)
        d = vote_diagonal(qa, qs, ta, ts)
        pairs.append((qa, qs, ta, ts, d))
    LQ, LT = 512, 512
    qa, qs, ta, ts, ql, tl, d0 = _batchify(pairs, LQ, LT)

    scores = build_scores(qa, qs, ta, ts, ql, tl, saa, s3d, w_aa=W_AA, w_3di=W_3DI)
    if ungapped:
        fb, fqe, fte = ungapped_forward_xla(scores)
    else:
        fb, fqe, fte = sw_forward_xla(scores, go=GO, ge=GE, gap_window=64)
    bb, bqe, bte = sw_forward_banded(
        qa, qs, ta, ts, ql, tl, d0, saa, s3d,
        W=256, go=GO, ge=GE, w_aa=W_AA, w_3di=W_3DI,
        gap_window=0 if ungapped else 64, ungapped=ungapped,
    )
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(bb))
    np.testing.assert_array_equal(np.asarray(fqe), np.asarray(bqe))
    np.testing.assert_array_equal(np.asarray(fte), np.asarray(bte))


def test_banded_traceback_matches_full():
    saa = get_aa_matrix().astype(np.float64)
    s3d = get_3di_matrix().astype(np.float64)
    rng = np.random.RandomState(23)
    qa, qs, ta, ts, _ = _planted_pair(rng, L=280, shift=20)
    d = vote_diagonal(qa, qs, ta, ts)
    s_full = W_AA * saa[qa[:, None], ta[None, :]] + W_3DI * s3d[qs[:, None], ts[None, :]]
    fscore, _, _, _, _, fq, ft = sw_traceback_ref(s_full, GO, GE)
    sb, _ = band_scores_ref(qa, qs, ta, ts, d, 256, saa, s3d, W_AA, W_3DI)
    bscore, bq, bt = sw_traceback_banded_ref(sb, d, GO, GE)
    assert bscore == fscore
    np.testing.assert_array_equal(fq, bq)
    np.testing.assert_array_equal(ft, bt)


def test_banded_sharded_matches_single():
    import jax
    from unicore_tpu.ops.banded import sw_forward_banded_sharded

    saa = get_aa_matrix().astype(np.float32)
    s3d = get_3di_matrix().astype(np.float32)
    rng = np.random.RandomState(19)
    pairs = []
    for i in range(8):
        qa, qs, ta, ts, _ = _planted_pair(rng, L=200, shift=int(rng.randint(0, 50)))
        d = vote_diagonal(qa, qs, ta, ts)
        pairs.append((qa, qs, ta, ts, d))
    qa, qs, ta, ts, ql, tl, d0 = _batchify(pairs, 256, 256)

    single = sw_forward_banded(
        qa, qs, ta, ts, ql, tl, d0, saa, s3d,
        W=256, go=GO, ge=GE, w_aa=W_AA, w_3di=W_3DI, gap_window=64,
    )
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("dp",))
    sharded = sw_forward_banded_sharded(
        qa, qs, ta, ts, ql, tl, d0, saa, s3d, mesh,
        W=256, go=GO, ge=GE, w_aa=W_AA, w_3di=W_3DI, gap_window=64,
    )
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_long_routing_matches_full_path():
    """Force the banded path with a tiny long_threshold and check the
    hits (scores, coordinates, m8 columns) match the full-matrix path."""
    from unicore_tpu.align.engine import AlignmentEngine, AlignParams

    rng = np.random.RandomState(5)
    q_aa, q_ss, t_aa, t_ss = [], [], [], []
    for _ in range(4):
        qa, qs, ta, ts, _ = _planted_pair(rng, L=260, shift=15)
        q_aa.append(qa)
        q_ss.append(qs)
        t_aa.append(ta)
        t_ss.append(ts)
    pairs = [(i, i) for i in range(4)] + [(0, 1)]

    full = AlignmentEngine(AlignParams(backend="xla", long_threshold=0))
    band = AlignmentEngine(AlignParams(backend="xla", long_threshold=64))
    h_full = full.align_pairs(q_aa, q_ss, t_aa, t_ss, pairs)
    h_band = band.align_pairs(q_aa, q_ss, t_aa, t_ss, pairs)
    full.traceback_fill(h_full, q_aa, q_ss, t_aa, t_ss)
    band.traceback_fill(h_band, q_aa, q_ss, t_aa, t_ss)

    assert len(h_full) == len(h_band) == 4  # the (0,1) junk pair gated out
    for a, b in zip(h_full, h_band):
        assert (a.qidx, a.tidx) == (b.qidx, b.tidx)
        assert a.score == b.score
        assert (a.qstart, a.qend, a.tstart, a.tend) == (b.qstart, b.qend, b.tstart, b.tend)
        assert (a.alnlen, a.mismatch, a.gapopen) == (b.alnlen, b.mismatch, b.gapopen)
        assert a.fident == b.fident


def _distant_pair(rng, L=300, shift=30):
    """Distant structural homolog: every AA 6-mer broken by within-group
    (Murphy) substitutions at ~55% of positions (so AA identity < 45%
    and no exact combined 6-mer survives), 3Di perturbed every 5th
    position (structure conserved but combined words all broken)."""
    from unicore_tpu.ops.banded import REDUCED_AA_GROUPS

    groups = {}
    for code, g in enumerate(REDUCED_AA_GROUPS[:20]):
        groups.setdefault(int(g), []).append(code)
    qa = rng.randint(0, 20, L).astype(np.int32)
    qs = rng.randint(0, 20, L).astype(np.int32)
    ta = np.concatenate([rng.randint(0, 20, shift), qa.copy()]).astype(np.int32)
    ts = np.concatenate([rng.randint(0, 20, shift), qs.copy()]).astype(np.int32)
    for i in range(shift, shift + L):
        if rng.rand() < 0.55:  # conservative (same-group) substitution
            others = [c for c in groups[int(REDUCED_AA_GROUPS[ta[i]])] if c != ta[i]]
            if others:
                ta[i] = others[rng.randint(len(others))]
    # break every combined 6-mer: a guaranteed-different 3Di letter at
    # every 5th position (each 6-window contains one)
    idx = np.arange(shift, len(ts), 5)
    ts[idx] = (ts[idx] + rng.randint(1, 20, len(idx))) % 20
    return qa, qs, ta, ts, shift


def test_sensitive_vote_rescues_distant_homolog():
    """Zero combined 6-mers but conserved structure: the sensitive
    (3Di-only / reduced-AA) vote must still find the planted diagonal."""
    from unicore_tpu.ops.banded import vote_diagonal_sensitive

    rng = np.random.RandomState(11)
    for shift in (0, 30, 90):
        qa, qs, ta, ts, true = _distant_pair(rng, L=300, shift=shift)
        assert vote_diagonal(qa, qs, ta, ts) is None  # the old cliff
        d = vote_diagonal_sensitive(qa, qs, ta, ts)
        assert d is not None
        assert abs(d - true) <= 16, (d, true)


def test_engine_distant_long_pairs_match_full_sw():
    """Round-2 VERDICT #8 'done' criterion: long pairs with no exact
    shared 6-mer produce hits identical to full SW — via the sensitive
    seed when it fires, via the full-SW fallback when even that fails."""
    from unicore_tpu.align.engine import AlignmentEngine, AlignParams

    rng = np.random.RandomState(23)
    q_aa, q_ss, t_aa, t_ss = [], [], [], []
    # two distant homolog pairs (sensitive-seed path)
    for _ in range(2):
        qa, qs, ta, ts, _ = _distant_pair(rng, L=280, shift=25)
        q_aa.append(qa); q_ss.append(qs); t_aa.append(ta); t_ss.append(ts)
    # one pair with NO homology signal at all: an unrelated random
    # target.  The fallback must NOT burn a full O(Lq*Lt) DP on it
    # (chance-level pairs pass hashed-bag prefilters by the hundreds at
    # scale); it scores 0, as foldseek's prefilter would enforce.
    qa = rng.randint(0, 20, 280).astype(np.int32)
    qs = rng.randint(0, 20, 280).astype(np.int32)
    q_aa.append(qa); q_ss.append(qs)
    t_aa.append(rng.randint(0, 20, 300).astype(np.int32))
    t_ss.append(rng.randint(0, 20, 300).astype(np.int32))
    pairs = [(i, i) for i in range(3)]

    from unicore_tpu.ops.banded import has_seed_evidence
    assert has_seed_evidence(q_aa[0], q_ss[0], t_aa[0], t_ss[0])
    assert not has_seed_evidence(q_aa[2], q_ss[2], t_aa[2], t_ss[2])

    full = AlignmentEngine(AlignParams(backend="xla", long_threshold=0))
    band = AlignmentEngine(AlignParams(backend="xla", long_threshold=64))
    # compare raw alignment results (pre-gate): the cliff was scoring
    # the HOMOLOG pairs 0, losing them before any gate ran
    r_full = full._sw_pass([(i, q_aa[i], q_ss[i], t_aa[i], t_ss[i]) for i in range(3)])
    r_band = band._sw_pass([(i, q_aa[i], q_ss[i], t_aa[i], t_ss[i]) for i in range(3)])
    for k in range(2):
        assert r_band[k] == r_full[k], (k, r_band[k], r_full[k])
    assert r_full[0][0] > 100  # the homologs really score
    assert r_band[2] == (0.0, 0, 0)  # chance-level pair dropped cheaply
