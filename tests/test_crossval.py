"""The reference cross-validation harness's diff logic (scripts/crossval.py)
must be trustworthy before any reference binaries exist: self-vs-self
must report full agreement, and planted differences must be caught.
(BASELINE config 1 readiness; easy_core.rs:14-93 pipeline contract.)"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import crossval  # noqa: E402


def _mk_out(root, tdi, clusters, copiness, core, newick):
    """Materialize a minimal easy-core output dir."""
    from unicore_tpu.io.seqdb import SeqDB

    os.makedirs(os.path.join(root, "cluster"))
    os.makedirs(os.path.join(root, "profile"))
    os.makedirs(os.path.join(root, "tree"))
    names = sorted(tdi)
    db = SeqDB(names=names, aa_seqs=["A" * len(tdi[n]) for n in names],
               ss_seqs=[tdi[n] for n in names])
    db.write(os.path.join(root, "proteome", "proteome_db"))
    with open(os.path.join(root, "cluster", "clust.tsv"), "w") as f:
        for rep, members in clusters.items():
            for m in members:
                f.write(f"{rep}\t{m}\n")
    with open(os.path.join(root, "profile", "copiness.tsv"), "w") as f:
        f.write("Query\tMultipleCopyPercent\tSingleCopyPercent\n")
        for g, (mp, sp) in copiness.items():
            f.write(f"{g}\t{mp}\t{sp}\n")
    for g, members in core.items():
        with open(os.path.join(root, "profile", f"{g}.txt"), "w") as f:
            for gene, spe in sorted(members):
                f.write(f"{gene}\t{spe}\n")
    with open(os.path.join(root, "tree", "fasttree.nwk"), "w") as f:
        f.write(newick + "\n")


BASE = dict(
    tdi={"unicore_aaa": "DDLVV", "unicore_bbb": "DPQWV", "unicore_ccc": "VVLCD"},
    clusters={"unicore_aaa": ["unicore_aaa", "unicore_bbb"], "unicore_ccc": ["unicore_ccc"]},
    copiness={"aaa": (0.0, 100.0), "ccc": (50.0, 50.0)},
    core={"aaa": {("unicore_aaa", "sp1"), ("unicore_bbb", "sp2")}},
    newick="((A:1,B:1):1,(C:1,D:1):1,E:1);",
)


def test_self_vs_self(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk_out(a, **BASE)
    _mk_out(b, **BASE)
    rep = crossval.diff_outputs(a, b)
    assert rep["3di"]["frac_identical"] == 1.0
    assert rep["3di"]["residue_identity"] == 1.0
    assert rep["clusters"]["partitions_equal"] and rep["clusters"]["rand_index"] == 1.0
    assert rep["copiness"]["n_value_mismatch"] == 0
    assert rep["core_genes"]["set_equal"] and rep["core_genes"]["n_member_mismatch"] == 0
    assert rep["tree"]["topology_identical"]
    assert rep["verdict"]["config1_pass"]


def test_planted_differences_caught(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk_out(a, **BASE)
    mod = dict(BASE)
    mod["tdi"] = dict(BASE["tdi"], unicore_bbb="DPQWD")  # 1 residue differs
    mod["clusters"] = {"unicore_aaa": ["unicore_aaa"],
                       "unicore_ccc": ["unicore_ccc", "unicore_bbb"]}
    mod["copiness"] = dict(BASE["copiness"], ccc=(60.0, 40.0))
    mod["core"] = {"aaa": {("unicore_aaa", "sp1")}, "zzz": {("unicore_ccc", "sp3")}}
    mod["newick"] = "((A:1,C:1):1,(B:1,D:1):1,E:1);"  # different topology
    _mk_out(b, **mod)
    rep = crossval.diff_outputs(a, b)
    assert rep["3di"]["n_identical"] == 2 and rep["3di"]["frac_identical"] < 1.0
    assert 0.0 < rep["3di"]["residue_identity"] < 1.0
    assert not rep["clusters"]["partitions_equal"]
    assert rep["clusters"]["rand_index"] < 1.0
    assert rep["copiness"]["value_mismatch_genes"] == ["ccc"]
    assert not rep["core_genes"]["set_equal"]
    assert rep["core_genes"]["only_b"] == ["zzz"]
    assert rep["core_genes"]["n_member_mismatch"] == 1
    assert rep["tree"]["rf_distance"] > 0 and not rep["tree"]["topology_identical"]
    assert not rep["verdict"]["config1_pass"]


def test_cli_self_diff_exit_codes(tmp_path):
    """The one-command entry works on existing output dirs and exit code
    encodes the config-1 verdict."""
    a = str(tmp_path / "a")
    _mk_out(a, **BASE)
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "crossval.py")
    r = subprocess.run(
        [sys.executable, script, "--ref-out", a, "--ours-out", a,
         "--json-out", str(tmp_path / "rep.json")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    rep = json.loads(open(tmp_path / "rep.json").read())
    assert rep["verdict"]["config1_pass"]


def test_missing_binary_is_reported(tmp_path):
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "crossval.py")
    r = subprocess.run(
        [sys.executable, script, "--workdir", str(tmp_path)],
        capture_output=True, text=True,
        env={k: v for k, v in os.environ.items() if k != "UNICORE_BIN"},
    )
    assert r.returncode == 2
    assert "no --unicore-bin" in r.stderr
