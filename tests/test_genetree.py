"""gene-tree module test on a synthetic tree-module output layout."""

import os

from types import SimpleNamespace


def _gt_args(input_dir, **kw):
    a = SimpleNamespace(
        genetree_input=str(input_dir),
        genetree_names="",
        genetree_tree_builder="fasttree",
        genetree_tree_options="-gamma -boot 20",
        genetree_realign=False,
        genetree_aligner="foldmason",
        genetree_aligner_options=None,
        genetree_threshold=50,
    )
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _make_gene(fasta_dir, gene, msa):
    gd = fasta_dir / gene
    gd.mkdir(parents=True)
    with open(gd / f"{gene}.fa.filtered", "w") as f:
        for h, s in msa.items():
            f.write(f">{h}\n{s}\n")
    # stale iqtree output that must be deleted (genetree.rs:117-131)
    (gd / "iqtree.treefile").write_text("(stale);\n")


def test_genetree_runs_per_gene(tmp_path):
    from unicore_tpu.modules import genetree

    fasta_dir = tmp_path / "fasta"
    msa = {
        "sp1": "ACDEFGHIKLMNPQRSTVWY",
        "sp2": "ACDEFGHIKLMNPQRSTVWF",
        "sp3": "ACDEYGHIKLMNPQRSTVWY",
        "sp4": "ACDEYGHIKTMNPQRSTVWY",
    }
    _make_gene(fasta_dir, "geneA", msa)
    _make_gene(fasta_dir, "geneB", msa)

    genetree.run(_gt_args(tmp_path))

    for gene in ("geneA", "geneB"):
        gd = fasta_dir / gene
        assert (gd / "fasttree.nwk").exists()
        assert not (gd / "iqtree.treefile").exists()  # stale output removed
        from unicore_tpu.phylo.newick import parse_newick
        t = parse_newick(open(gd / "fasttree.nwk").read())
        assert sorted(l.name for l in t.leaves()) == ["sp1", "sp2", "sp3", "sp4"]


def test_genetree_realign(tmp_path):
    """--realign recomputes the MSA from aa.fasta/3di.fasta before trees."""
    from unicore_tpu.modules import genetree

    fasta_dir = tmp_path / "fasta"
    gd = fasta_dir / "geneA"
    gd.mkdir(parents=True)
    seqs = {
        "sp1": "MKVLITGGGSGIGL",
        "sp2": "MKVLITGGSGIGL",
        "sp3": "MKVLITGGGSGIGL",
    }
    with open(gd / "aa.fasta", "w") as f:
        for h, s in seqs.items():
            f.write(f">{h}\n{s}\n")
    with open(gd / "3di.fasta", "w") as f:
        for h, s in seqs.items():
            f.write(f">{h}\n{'D' * len(s)}\n")

    genetree.run(_gt_args(tmp_path, genetree_realign=True, genetree_threshold=0))

    msa = (gd / "geneA.fa.filtered").read_text()
    assert msa.startswith(">")
    lens = {len(l) for l in msa.splitlines() if not l.startswith(">")}
    assert len(lens) == 1  # aligned to equal length
    assert (gd / "fasttree.nwk").exists()


def test_genetree_name_filter(tmp_path):
    from unicore_tpu.modules import genetree

    fasta_dir = tmp_path / "fasta"
    msa = {"sp1": "ACDEFGHIKL", "sp2": "ACDEFGHIKW", "sp3": "ACDQFGHIKL"}
    _make_gene(fasta_dir, "geneA", msa)
    _make_gene(fasta_dir, "geneB", msa)
    names = tmp_path / "names.txt"
    names.write_text("geneB\n")

    genetree.run(_gt_args(tmp_path, genetree_names=str(names)))
    assert not (fasta_dir / "geneA" / "fasttree.nwk").exists()
    assert (fasta_dir / "geneB" / "fasttree.nwk").exists()
