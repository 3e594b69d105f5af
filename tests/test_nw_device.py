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
