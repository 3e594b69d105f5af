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
