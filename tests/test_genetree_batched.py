"""Batched gene-tree inference (phylo/genebatch.py + TreeEngine.run_files):
lockstep cross-gene search must reproduce the solo per-gene search, and
the genetree module must route through the batched path."""

import os

import numpy as np
import pytest

from unicore_tpu.phylo.engine import TreeEngine
from unicore_tpu.phylo.newick import parse_newick, rf_distance


def _gene_msa(rng, n_taxa, L, mut=0.25):
    letters = "ARNDCQEGHILKMFPSTWYV"
    base = rng.choice(list(letters), L)
    msa = {}
    prev = base
    for t in range(n_taxa):
        s = prev.copy()
        for i in range(L):
            if rng.rand() < mut:
                s[i] = rng.choice(list(letters))
        msa[f"sp{t}"] = "".join(s)
        prev = s  # chain: creates real tree signal
    return msa


@pytest.fixture(scope="module")
def genes():
    rng = np.random.RandomState(42)
    return [
        _gene_msa(rng, 5, 60),
        _gene_msa(rng, 5, 90),   # same taxa count, different length
        _gene_msa(rng, 6, 75),   # different taxa count -> its own group
        _gene_msa(rng, 2, 40),   # trivial 2-taxon gene
    ]


def test_lockstep_matches_solo_infer(genes):
    eng = TreeEngine("fasttree")
    opts = "-gamma"
    batched = eng.infer_batched(genes, options=opts)
    for msa, (bt, bll, binfo) in zip(genes, batched):
        st, sll, sinfo = eng.infer(msa, options=opts)
        if len(msa) < 3:
            assert {n.name for n in bt.leaves()} == set(msa)
            continue
        assert rf_distance(bt, st) == 0, (bt.to_newick(), st.to_newick())
        assert abs(bll - sll) < 1e-3 * max(1.0, abs(sll)), (bll, sll)
        assert binfo["n_patterns"] == sinfo["n_patterns"]  # real, not padded


def test_run_files_writes_per_gene_outputs(genes, tmp_path):
    eng = TreeEngine("fasttree")
    fastas, outdirs = [], []
    for g, msa in enumerate(genes[:3]):
        p = tmp_path / f"g{g}.fa"
        with open(p, "w") as f:
            for n, s in msa.items():
                f.write(f">{n}\n{s}\n")
        fastas.append(str(p))
        outdirs.append(str(tmp_path / f"out{g}"))
    paths = eng.run_files(fastas, outdirs, options="-gamma")
    assert len(paths) == 3
    for p, msa in zip(paths, genes[:3]):
        t = parse_newick(open(p).read().strip())
        assert {n.name for n in t.leaves()} == set(msa)


def test_genetree_module_batched_path(tmp_path):
    """The gene-tree module routes through run_files and produces the
    per-builder outputs in each gene dir."""
    from unicore_tpu.cli import build_parser, resolve
    from unicore_tpu.modules import genetree

    rng = np.random.RandomState(7)
    fasta_dir = tmp_path / "tree" / "fasta"
    for g in range(3):
        msa = _gene_msa(rng, 5, 50)
        gd = fasta_dir / f"gene{g}"
        gd.mkdir(parents=True)
        with open(gd / f"gene{g}.fa.filtered", "w") as f:
            for n, s in msa.items():
                f.write(f">{n}\n{s}\n")
    ns = build_parser().parse_args(
        ["gene-tree", str(tmp_path / "tree"),
         "--tree-builder", "fasttree", "--tree-options=-gamma"]
    )
    genetree.run(resolve(ns))
    for g in range(3):
        out = fasta_dir / f"gene{g}" / "fasttree.nwk"
        assert out.is_file()
        t = parse_newick(out.read_text().strip())
        assert len(list(t.leaves())) == 5
