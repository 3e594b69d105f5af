"""End-to-end easy-core on a subset of the reference example proteomes
(the de-facto integration fixture, README.md:62-84), using the mock 3Di
backend and the fasttree schedule for speed."""

import os

import pytest

from unicore_tpu.cli import build_parser, resolve
from unicore_tpu.workflow import easy_core


@pytest.mark.slow
def test_easy_core_example_subset(tmp_path, example_data_dir):
    # 4 spirochaete proteomes, subset for CPU runtime
    species = [
        "Treponema_pallidum.fa",
        "Treponema_denticola.fa",
        "Treponema_brennaborense.fa",
        "Leptospira_biflexa.fa",
    ]
    ind = tmp_path / "in"
    ind.mkdir()
    for s in species:
        src = os.path.join(example_data_dir, s)
        (ind / s).write_text(open(src).read())

    out = tmp_path / "out"
    tmpd = tmp_path / "tmp"
    ns = build_parser().parse_args(
        [
            "easy-core", str(ind), str(out), "mock", str(tmpd),
            "--tree-builder", "fasttree",
            "--tree-options=-gamma -boot 50",
            "--aligner", "foldmason",
        ]
    )
    args = resolve(ns)
    easy_core.run(args)

    # createdb artifacts
    assert (out / "proteome" / "proteome_db").exists()
    assert (out / "proteome" / "proteome_db.map").exists()
    assert (out / "proteome" / "combined_aa.fasta").exists()
    assert open(out / "proteome" / "createdb.chk").read() == "1"

    # cluster artifacts
    clust_tsv = out / "cluster" / "clust.tsv"
    assert clust_tsv.exists()
    lines = open(clust_tsv).read().splitlines()
    assert lines, "empty clustering"
    # grouped by representative (profile.rs:55 contract)
    seen, prev = set(), None
    for ln in lines:
        rep = ln.split("\t")[0]
        if rep != prev:
            assert rep not in seen, "cluster tsv not grouped by representative"
            seen.add(rep)
            prev = rep

    # profile artifacts
    prof = out / "profile"
    assert (prof / "copiness.tsv").exists()
    gene_lists = [f for f in os.listdir(prof) if f.endswith(".txt")]
    assert gene_lists, "no core genes found on example subset"

    # tree artifacts
    tree_dir = out / "tree"
    assert (tree_dir / "combined.fasta").exists()
    assert (tree_dir / "combined.fasta.partitions").exists()
    nwk = tree_dir / "fasttree.nwk"
    assert nwk.exists()
    from unicore_tpu.phylo.newick import parse_newick
    t = parse_newick(open(nwk).read())
    names = sorted(l.name for l in t.leaves())
    assert names == sorted(s[:-3] for s in species)
    assert open(tree_dir / "tree.chk").read() == "1"

    # resume: re-running skips everything (checkpoints)
    easy_core.run(args)
