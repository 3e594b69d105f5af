"""Tests for the bit-exact profile stage (vs src/modules/profile.rs semantics)."""

import os

from unicore_tpu.modules.profile import fmt_f64, profile


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


def test_fmt_f64_matches_rust_display():
    assert fmt_f64(10.0) == "10"
    assert fmt_f64(100.0) == "100"
    assert fmt_f64(3.3333333333333335) == "3.3333333333333335"
    assert fmt_f64(66.66666666666667) == "66.66666666666667"
    assert fmt_f64(0.0) == "0"


def test_profile_core_gene_identification(tmp_path):
    # 3 species; gene g is single-copy in all 3 -> core at threshold 80
    mapping = tmp_path / "db.map"
    _write(
        mapping,
        "gA1\tspe1\thdr1\n"
        "gA2\tspe2\thdr2\n"
        "gA3\tspe3\thdr3\n"
        "gB1\tspe1\thdr4\n"
        "gB2\tspe1\thdr5\n"
        "gB3\tspe2\thdr6\n",
    )
    tsv = tmp_path / "clust.tsv"
    _write(
        tsv,
        # cluster A: one member per species -> core
        "gA1\tgA1\ngA1\tgA2\ngA1\tgA3\n"
        # cluster B: two copies in spe1, one in spe2 -> single-copy pct = 33.3
        "gB1\tgB1\ngB1\tgB2\ngB1\tgB3\n",
    )
    outdir = tmp_path / "out"
    os.makedirs(outdir)
    profile(str(tsv), str(mapping), str(outdir), 80, True)

    lines = open(outdir / "copiness.tsv").read().splitlines()
    assert lines[0] == "Query\tMultipleCopyPercent\tSingleCopyPercent"
    assert lines[1] == "gA1\t100\t100"
    # cluster B: species with >=1 copy = 2/3 -> 66.66666666666667,
    # single copy = 1/3 -> 33.333333333333336
    assert lines[2] == f"gB1\t{fmt_f64(200.0 / 3)}\t{fmt_f64(100.0 / 3)}"

    assert (outdir / "gA1.txt").exists()
    assert not (outdir / "gB1.txt").exists()
    content = sorted(open(outdir / "gA1.txt").read().splitlines())
    assert content == ["gA1\tspe1", "gA2\tspe2", "gA3\tspe3"]


def test_profile_single_copy_only_membership(tmp_path):
    # spe1 has two distinct members in the core cluster -> excluded from .txt
    mapping = tmp_path / "db.map"
    _write(
        mapping,
        "g1\tspe1\th\n" "g2\tspe1\th\n" "g3\tspe2\th\n" "g4\tspe3\th\n",
    )
    tsv = tmp_path / "clust.tsv"
    _write(tsv, "g1\tg1\ng1\tg2\ng1\tg3\ng1\tg4\n")
    outdir = tmp_path / "out"
    os.makedirs(outdir)
    # threshold 50: single-copy species = {spe2, spe3} = 2/3 = 66% >= 50 -> core
    profile(str(tsv), str(mapping), str(outdir), 50, True)
    content = sorted(open(outdir / "g1.txt").read().splitlines())
    assert content == ["g3\tspe2", "g4\tspe3"]


def test_profile_afdb_display_name(tmp_path):
    mapping = tmp_path / "db.map"
    _write(mapping, "m1\tspe1\th\n")
    tsv = tmp_path / "clust.tsv"
    _write(tsv, "AF-Q12345-F1\tm1\n")
    outdir = tmp_path / "out"
    os.makedirs(outdir)
    profile(str(tsv), str(mapping), str(outdir), 80, False)
    # display name = split('-')[1] (profile.rs:135)
    assert (outdir / "Q12345.txt").exists()
    assert not (outdir / "copiness.tsv").exists()


def test_profile_shared_sequence_multi_species(tmp_path):
    # identical sequence present in two species -> one map line per species,
    # membership counts once per species (gene_to_spe is a set)
    mapping = tmp_path / "db.map"
    _write(mapping, "g1\tspe1\th\ng1\tspe2\th\ng2\tspe3\th\n")
    tsv = tmp_path / "clust.tsv"
    _write(tsv, "g1\tg1\ng1\tg2\n")
    outdir = tmp_path / "out"
    os.makedirs(outdir)
    profile(str(tsv), str(mapping), str(outdir), 80, True)
    lines = open(outdir / "copiness.tsv").read().splitlines()
    assert lines[1] == "g1\t100\t100"
    content = sorted(open(outdir / "g1.txt").read().splitlines())
    assert content == ["g1\tspe1", "g1\tspe2", "g2\tspe3"]
