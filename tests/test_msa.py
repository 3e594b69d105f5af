"""Progressive MSA, gap filter, and concatenation tests."""

import numpy as np

from unicore_tpu.msa.concat import combine_fasta
from unicore_tpu.msa.gapfilter import filter_columns, filter_msa
from unicore_tpu.msa.guide_tree import kmer_distance_matrix, upgma
from unicore_tpu.msa.progressive import ProgressiveMSA
from unicore_tpu.ops.nw import nw_align


def test_nw_align_identical():
    S = np.full((4, 4), -1.0, dtype=np.float32)
    np.fill_diagonal(S, 5.0)
    path, score = nw_align(S, go=5, ge=1)
    assert path == [(0, 0), (1, 1), (2, 2), (3, 3)]
    assert score == 20.0


def test_nw_align_insertion():
    # profile2 has one extra column in the middle
    S = np.full((4, 5), -2.0, dtype=np.float32)
    for i, j in [(0, 0), (1, 1), (2, 3), (3, 4)]:
        S[i, j] = 5.0
    path, _ = nw_align(S, go=3, ge=1)
    assert (0, 0) in path and (3, 4) in path
    assert (-1, 2) in path  # the gapped extra column
    assert len(path) == 5


def test_progressive_msa_identical_seqs():
    m = ProgressiveMSA(mode="aa")
    out = m.align(["a", "b", "c"], ["ACDEFG", "ACDEFG", "ACDEFG"])
    assert out == {"a": "ACDEFG", "b": "ACDEFG", "c": "ACDEFG"}


def test_progressive_msa_indel():
    m = ProgressiveMSA(mode="aa")
    out = m.align(
        ["a", "b", "c"],
        ["MKVLITGGGSGIGL", "MKVLITGGSGIGL", "MKVLITGGGSGIGL"],
    )
    # all alignments same length, b has exactly one gap
    lens = {len(s) for s in out.values()}
    assert len(lens) == 1
    assert out["a"].replace("-", "") == "MKVLITGGGSGIGL"
    assert out["b"].count("-") == 1


def test_progressive_msa_3di_mode():
    m = ProgressiveMSA(mode="3di+aa")
    out = m.align(
        ["a", "b"],
        ["ACDEFGHIKL", "ACDEFGHIKL"],
        ["DDDDDDDDDD", "DDDDDDDDDD"],
    )
    assert out["a"] == "ACDEFGHIKL"


def test_upgma_groups_similar():
    seqs = ["MKVLITGGGSGIGLAIAKE" * 3, "MKVLITGGGSGIGLAIAKR" * 3, "WWPPYYQQNNRRSSTTVVX" * 3]
    D = kmer_distance_matrix(seqs)
    assert D[0, 1] < D[0, 2]
    root = upgma(D)
    # the deepest split separates {0,1} from {2}
    leaves_left = _leaves(root.left)
    leaves_right = _leaves(root.right)
    assert {tuple(sorted(leaves_left)), tuple(sorted(leaves_right))} == {(0, 1), (2,)}


def _leaves(node):
    if node.is_leaf:
        return [node.idx]
    return _leaves(node.left) + _leaves(node.right)


def test_filter_columns_semantics():
    msa = {"a": "A-C", "b": "A--", "c": "AAC"}
    # col0: 3/3, col1: 1/3 (33%), col2: 2/3 (67%)
    out = filter_columns(msa, 50)
    assert out == {"a": "AC", "b": "A-", "c": "AC"}
    # threshold 0: everything kept (0*n <= count*100 always)
    assert filter_columns(msa, 0) == msa


def test_filter_msa_file(tmp_path):
    p = str(tmp_path / "in.fa")
    with open(p, "w") as f:
        f.write(">a\nA-C\n>b\nA--\n>c\nAAC\n")
    out = str(tmp_path / "out.fa")
    filter_msa(p, out, 50)
    from unicore_tpu.io.fasta import read_fasta
    assert read_fasta(out) == {"a": "AC", "b": "A-", "c": "AC"}


def test_combine_fasta(tmp_path):
    g1 = tmp_path / "fasta" / "gene1"
    g2 = tmp_path / "fasta" / "gene2"
    g1.mkdir(parents=True)
    g2.mkdir(parents=True)
    (g1 / "gene1.fa.filtered").write_text(">sp1\nACDE\n>sp2\nACDF\n")
    (g2 / "gene2.fa.filtered").write_text(">sp2\nKLM\n>sp3\nKLM\n")
    out = tmp_path / "tree"
    out.mkdir()
    combine_fasta(
        [str(g1 / "gene1.fa.filtered"), str(g2 / "gene2.fa.filtered")], str(out)
    )
    from unicore_tpu.io.fasta import read_fasta
    combined = read_fasta(str(out / "combined.fasta"))
    assert combined == {
        "sp1": "ACDE---",
        "sp2": "ACDFKLM",
        "sp3": "----KLM",
    }
    parts = open(out / "combined.fasta.partitions").read().splitlines()
    assert parts == ["JTT+F+I+G, gene1=1-4", "JTT+F+I+G, gene2=5-7"]


def test_refinement_batched_matches_host_reference():
    """The cross-gene batched linsi refinement (align_many) must produce
    byte-identical alignments to the sequential host `_refine` reference
    on every gene, and multi-gene batching must not change single-gene
    results."""
    import numpy as np
    from unicore_tpu.msa.progressive import ProgressiveMSA

    rng = np.random.RandomState(4)
    letters = "ARNDCQEGHILKMFPSTWYV"

    def fam(n, L, mut=0.15):
        base = "".join(rng.choice(list(letters), L))
        seqs = []
        for _ in range(n):
            s = list(base)
            for i in range(L):
                if rng.rand() < mut:
                    s[i] = rng.choice(list(letters))
            if rng.rand() < 0.5:  # an indel
                cut = rng.randint(5, L - 5)
                del s[cut:cut + 2]
            seqs.append("".join(s))
        return seqs

    genes = []
    for g, (n, L) in enumerate(((4, 60), (5, 45), (3, 70))):
        seqs = fam(n, L)
        genes.append(([f"g{g}s{i}" for i in range(n)], seqs, None))

    eng = ProgressiveMSA(mode="aa", refine_iters=2)
    batched = eng.align_many(genes)

    # host reference: unrefined root + sequential _refine per gene
    eng0 = ProgressiveMSA(mode="aa", refine_iters=0)
    for (names, seqs, _), got in zip(genes, batched):
        # reconstruct via the single-gene path (same batched machinery,
        # batch size 1): must equal the multi-gene batch result
        solo = eng.align(names, seqs)
        assert solo == got
        # and equal the pure-host sequential refinement
        import unicore_tpu.msa.progressive as P
        aa_codes = [P.encode_aa(s).astype(np.int32) for s in seqs]
        base = eng0.align(names, seqs)
        # rebuild the unrefined alignment as an index matrix
        cols = []
        for i, nm in enumerate(names):
            a = base[nm]
            pos = -np.ones(len(a), dtype=np.int32)
            k = 0
            for c, ch in enumerate(a):
                if ch != "-":
                    pos[c] = k
                    k += 1
            cols.append(pos)
        aln = P._Alignment(list(range(len(names))), np.stack(cols))
        for _ in range(2):
            aln = eng0._refine(aln, aa_codes, None)
        ref = eng0._emit(aln, names, seqs)
        assert ref == got, names[0]
