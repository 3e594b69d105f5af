"""Device NW (batched bits kernel) vs host reference nw_align.

Integer quantized scores make the two bit-identical — including every
tie decision — so paths are compared EXACTLY.
"""

import numpy as np

from unicore_tpu.msa.progressive import ProgressiveMSA
from unicore_tpu.ops.nw import nw_align, quantize_scores
from unicore_tpu.ops.nw_device import decode_path, nw_align_batch

RNG = np.random.RandomState(42)


def _random_score(L1, L2):
    # profile-score-like: mostly negative with a planted diagonal band
    S = RNG.randn(L1, L2).astype(np.float64) * 2.0 - 1.0
    w = min(L1, L2)
    S[np.arange(w), np.arange(w)] += 6.0
    return quantize_scores(S)


def test_nw_device_matches_host_paths():
    go, ge = 11 * 256, 256
    cases = [(12, 17), (1, 9), (9, 1), (64, 64), (33, 70), (128, 40)]
    S_list = [_random_score(a, b) for a, b in cases]
    dev = nw_align_batch(S_list, go, ge)
    for S, (dpath, dscore) in zip(S_list, dev):
        hpath, hscore = nw_align(S, go=go, ge=ge)
        assert dpath == hpath
        assert dscore == hscore


def test_nw_device_gap_cases():
    """Free-end and all-gap shapes."""
    go, ge = 11 * 256, 256
    S_list = [
        quantize_scores(np.full((5, 5), -3.0)),      # nothing aligns well
        quantize_scores(np.zeros((0, 4))),           # degenerate: empty rows
        quantize_scores(np.zeros((6, 0))),           # degenerate: empty cols
    ]
    dev = nw_align_batch(S_list, go, ge)
    h0, s0 = nw_align(S_list[0], go=go, ge=ge)
    assert dev[0] == (h0, s0)
    assert dev[1][0] == [(-1, j) for j in range(4)]
    assert dev[2][0] == [(i, -1) for i in range(6)]


def test_align_many_equals_sequential_align():
    """Cross-gene batched scheduling returns exactly the per-gene result."""
    rng = np.random.RandomState(5)
    letters = "ARNDCQEGHILKMFPSTWYV"
    genes = []
    for g in range(3):
        base = "".join(rng.choice(list(letters), 40 + 10 * g))
        names, seqs = [], []
        for m in range(4 + g):
            s = list(base)
            for _ in range(3):
                s[rng.randint(len(base))] = rng.choice(list(letters))
            if m % 2:
                del s[rng.randint(len(s))]
            names.append(f"g{g}m{m}")
            seqs.append("".join(s))
        genes.append((names, seqs, None))

    eng = ProgressiveMSA(mode="aa")
    batched = eng.align_many(genes)
    for gene, got in zip(genes, batched):
        single = eng.align(gene[0], gene[1])
        assert got == single


def test_decode_path_covers_all_columns():
    go, ge = 11 * 256, 256
    S = _random_score(20, 31)
    (path, _), = nw_align_batch([S], go, ge)
    qs = [i for i, _ in path if i >= 0]
    ts = [j for _, j in path if j >= 0]
    assert qs == list(range(20))
    assert ts == list(range(31))


def test_counts_path_matches_host_reference():
    """The fused device path (count profiles -> MXU scores -> integer
    quantization -> forward -> device traceback walk) must reproduce the
    host reference merge (same integer formula + nw_align + decode)
    path-for-path, including tie decisions."""
    import numpy as np
    from unicore_tpu.msa.progressive import (
        ProgressiveMSA, _Alignment, _count_profile,
    )
    from unicore_tpu.alphabets import AA_SIZE, TDI_SIZE
    from unicore_tpu.ops.nw import nw_align
    from unicore_tpu.ops.nw_device import nw_align_batch_counts

    rng = np.random.RandomState(4)
    eng = ProgressiveMSA(mode="3di+aa")
    entries, refs = [], []
    for _ in range(20):
        n1, n2 = rng.randint(1, 9), rng.randint(1, 9)
        L1, L2 = rng.randint(3, 120), rng.randint(3, 120)
        Lseq = 160
        aa_codes = [rng.randint(0, 21, Lseq) for _ in range(n1 + n2)]
        ss_codes = [rng.randint(0, 21, Lseq) for _ in aa_codes]
        def rand_aln(rows, L):
            cols = np.sort(rng.choice(Lseq, L, replace=False))
            return _Alignment(rows, np.broadcast_to(
                cols, (len(rows), L)).astype(np.int32).copy())
        a1 = rand_aln(list(range(n1)), L1)
        a2 = rand_aln(list(range(n1, n1 + n2)), L2)
        Sq = eng._score_matrix(a1, a2, aa_codes, ss_codes)
        refs.append(nw_align(Sq, go=eng.go_q, ge=eng.ge_q))
        entries.append((
            _count_profile(a1, aa_codes, AA_SIZE),
            _count_profile(a1, ss_codes, TDI_SIZE),
            _count_profile(a2, aa_codes, AA_SIZE),
            _count_profile(a2, ss_codes, TDI_SIZE),
            n1, n2,
        ))
    got = nw_align_batch_counts(entries, eng.go_q, eng.ge_q,
                                eng.saa, eng.s3d, eng._wA, eng._wS)
    for (rp, rs), (gp, gs) in zip(refs, got):
        assert gs == rs
        assert gp == rp


def test_device_decode_matches_host_decode():
    """_nw_decode_device + host assembly == decode_path on random bits."""
    import numpy as np
    import jax.numpy as jnp
    from unicore_tpu.ops.nw_device import (
        decode_path, nw_forward_bits, nw_align_batch,
    )

    rng = np.random.RandomState(9)
    S_list = [rng.randint(-400, 700, (rng.randint(2, 90), rng.randint(2, 90))).astype(np.int32)
              for _ in range(24)]
    # nw_align_batch is the bits+host-decode path; compare against the
    # counts-free device decode through nw_forward_bits + decode_path
    ref = nw_align_batch(S_list, 1100, 100)
    from unicore_tpu.ops.nw import nw_align
    for S, (p, s) in zip(S_list, ref):
        rp, rs = nw_align(S, go=1100, ge=100)
        assert p == rp and s == rs
