"""Module-level tests: search (reversed convention + m8), cluster module,
CLI path wiring, config module, lookup split."""

import os

import numpy as np
import pytest

from unicore_tpu.cli import build_parser, resolve
from unicore_tpu.io.seqdb import SeqDB


def _mkdb(path, names, aa, ss):
    SeqDB(names=names, aa_seqs=aa, ss_seqs=ss).write(str(path))
    return str(path)


def test_cli_easy_core_wiring():
    a = resolve(build_parser().parse_args(["easy-core", "in", "out", "model", "tmp"]))
    assert a.createdb_output == "out/proteome/proteome_db"
    assert a.cluster_input == "out/proteome/proteome_db"
    assert a.cluster_output == "out/cluster/clust"
    assert a.profile_input_tsv == "out/cluster/clust.tsv"
    assert a.profile_output == "out/profile"
    assert a.tree_input == "out/profile"
    assert a.tree_output == "out/tree"
    assert a.cluster_cluster_options == "-c 0.8"
    assert a.profile_threshold == 80
    assert a.tree_threshold == 50
    assert a.tree_aligner == "foldmason"
    assert a.tree_tree_builder == "iqtree"


def test_cli_easy_search_wiring():
    a = resolve(build_parser().parse_args(["easy-search", "in", "targetdb", "out", "m", "tmp"]))
    assert a.search_input == "out/proteome/proteome_db"
    assert a.search_target == "targetdb"
    assert a.search_output == "out/search/search"
    assert a.profile_input_tsv == "out/search/search.m8"


def test_cli_profile_defaults():
    a = resolve(build_parser().parse_args(["profile", "db", "clust.tsv", "outdir"]))
    assert a.profile_input_db == "db"
    assert a.profile_threshold == 80
    assert a.profile_print_copiness is True


def test_search_module_reversed_convention(tmp_path):
    # proteome: two species' variants of one protein + one unrelated
    core = "MIRGGDIAKGTVLLHKGAPYLVVEREFVNPGKGAAFARVKMKAA"
    ss = "DVDVDVDVLLKKPQRSTVWYACDEFGHIKLMNPQRSTVWYACDE"
    prot = _mkdb(
        tmp_path / "prot_db",
        ["unicore_p1", "unicore_p2", "unicore_x"],
        [core, core[:-2] + "KK", "W" * 40],
        [ss, ss[:-2] + "AA", "C" * 40],
    )
    ref = _mkdb(tmp_path / "ref_db", ["AF-Q1-F1"], [core], [ss])

    ns = build_parser().parse_args(
        ["search", prot, ref, str(tmp_path / "res" / "search"), str(tmp_path / "tmp")]
    )
    from unicore_tpu.modules import search as search_mod
    args = resolve(ns)
    args.search_search_options = "-c 0.8 -e 10"
    search_mod.run(args)

    m8 = tmp_path / "res" / "search.m8"
    assert m8.exists()
    rows = [l.split("\t") for l in open(m8).read().splitlines()]
    assert rows, "no hits"
    # column 1 = reference gene (the foldseek query), column 2 = proteome gene
    assert all(r[0] == "AF-Q1-F1" for r in rows)
    assert {r[1] for r in rows} <= {"unicore_p1", "unicore_p2"}
    # m8 columns: fident alnlen mismatch gapopen qstart qend tstart tend evalue bits
    top = rows[0]
    assert float(top[2]) > 0.9
    assert int(top[6]) == 1  # 1-based qstart
    assert (tmp_path / "res" / "search.chk").read_text() == "1"


def test_cluster_module_groups_homologs(tmp_path):
    rng = np.random.RandomState(0)
    letters = "ARNDCQEGHILKMFPSTWYV"
    tdi = "ACDEFGHIKLMNPQRSTVWY"
    base_aa = "".join(rng.choice(list(letters), 60))
    base_ss = "".join(rng.choice(list(tdi), 60))
    names, aa, ss = [], [], []
    for i in range(3):  # family of 3
        s = list(base_aa)
        s[rng.randint(60)] = rng.choice(list(letters))
        names.append(f"unicore_f{i}")
        aa.append("".join(s))
        ss.append(base_ss)
    names.append("unicore_lone")
    aa.append("".join(rng.choice(list(letters), 55)))
    ss.append("".join(rng.choice(list(tdi), 55)))
    db = _mkdb(tmp_path / "db", names, aa, ss)

    ns = build_parser().parse_args(
        ["cluster", db, str(tmp_path / "clu" / "clust"), str(tmp_path / "tmp")]
    )
    from unicore_tpu.modules import cluster as cluster_mod
    cluster_mod.run(resolve(ns))

    tsv = tmp_path / "clu" / "clust.tsv"
    lines = [l.split("\t") for l in open(tsv).read().splitlines()]
    by_rep = {}
    for rep, mem in lines:
        by_rep.setdefault(rep, set()).add(mem)
    fam = {n for n in names if n.startswith("unicore_f")}
    assert any(fam <= members for members in by_rep.values()), by_rep
    # the unrelated sequence is a singleton
    assert any(members == {"unicore_lone"} for members in by_rep.values())


def test_custom_lookup_split(tmp_path):
    from unicore_tpu.seq.lookup import split_by_lookup

    _mkdb(tmp_path / "look_db", ["n1"], ["ACDEF"], ["DDDDD"])
    resolved, remaining = split_by_lookup(
        {"unicore_a": "ACDEF", "unicore_b": "KLMNP"},
        str(tmp_path / "look_db"),
        custom=True,
        out_dir=str(tmp_path),
    )
    assert resolved == {"unicore_a": ("ACDEF", "DDDDD")}
    assert remaining == {"unicore_b": "KLMNP"}
    assert (tmp_path / "converted_aa.fasta").exists()
    assert (tmp_path / "converted_ss.fasta").exists()


def test_config_check_runs(capsys):
    from unicore_tpu.modules import config as config_mod
    from unicore_tpu.runtime import logging as msg
    from types import SimpleNamespace

    msg.set_verbosity(3)  # other tests may lower the global level
    config_mod.run(SimpleNamespace(config_check=True))
    out = capsys.readouterr().out
    assert "foldseek" in out and "iqtree" in out
