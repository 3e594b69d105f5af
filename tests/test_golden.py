"""Golden-output regression tests on a fixed 3-proteome subset of the
reference example data (mock 3Di backend, default parameters).

Guards the exact observable outputs of createdb (hashed naming + 3Di
strings), cluster (memberships), and profile (copiness + core-gene sets)
against unintended changes.  Regenerate with /tmp-style driver if an
intentional algorithm change shifts them (see git history for the
generator snippet).
"""

import os
import shutil

import pytest

from unicore_tpu.cli import build_parser, resolve
from unicore_tpu.workflow import easy_core

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SPECIES = ["Treponema_pallidum.fa", "Treponema_denticola.fa", "Leptospira_biflexa.fa"]


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory, request):
    data = "/root/reference/example/data"
    if not os.path.isdir(data):
        pytest.skip("reference example data not available")
    work = tmp_path_factory.mktemp("golden")
    ind = work / "in"
    ind.mkdir()
    for s in SPECIES:
        shutil.copy(os.path.join(data, s), ind)
    ns = build_parser().parse_args(
        [
            "easy-core", str(ind), str(work / "out"), "mock", str(work / "tmp"),
            "--tree-builder", "fasttree", "--tree-options=-gamma -boot 10",
            "-v", "2",
        ]
    )
    easy_core.run(resolve(ns))
    return work / "out"


@pytest.mark.slow
def test_map_file_golden(pipeline_out):
    got = (pipeline_out / "proteome" / "proteome_db.map").read_text()
    want = open(os.path.join(GOLDEN, "proteome_db.map")).read()
    assert got == want


@pytest.mark.slow
def test_3di_sample_golden(pipeline_out):
    from unicore_tpu.io.seqdb import SeqDB

    db = SeqDB.read(str(pipeline_out / "proteome" / "proteome_db"))
    got = {n: s for n, s in zip(db.names, db.ss_seqs)}
    for line in open(os.path.join(GOLDEN, "3di_sample.tsv")):
        name, ss = line.rstrip("\n").split("\t")
        assert got[name] == ss, name


@pytest.mark.slow
def test_cluster_golden(pipeline_out):
    def clusters(text):
        out = {}
        for ln in text.splitlines():
            rep, mem = ln.split("\t")
            out.setdefault(rep, set()).add(mem)
        return out

    got = clusters((pipeline_out / "cluster" / "clust.tsv").read_text())
    want = clusters(open(os.path.join(GOLDEN, "clust.tsv")).read())
    assert got == want


@pytest.mark.slow
def test_profile_golden(pipeline_out):
    got = (pipeline_out / "profile" / "copiness.tsv").read_text()
    want = open(os.path.join(GOLDEN, "copiness.tsv")).read()
    assert got == want

    gene_files = sorted(
        f for f in os.listdir(pipeline_out / "profile") if f.endswith(".txt")
    )
    want_sets = {}
    for line in open(os.path.join(GOLDEN, "core_genes.txt")):
        g, members = line.rstrip("\n").split("\t", 1)
        want_sets[g] = set(members.split(";")) if members else set()
    assert set(gene_files) == set(want_sets)
    for g in gene_files:
        got_members = set((pipeline_out / "profile" / g).read_text().splitlines())
        assert got_members == want_sets[g], g
