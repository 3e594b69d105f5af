"""CLI smoke tests: version banner, config --set round trip, unknown cmd."""

import os

from unicore_tpu.cli import main


def test_version_banner(capsys):
    rc = main(["version"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "unicore-tpu version" in out


def test_no_command_prints_help(capsys):
    rc = main([])
    assert rc == 0
    assert "MODULE" in capsys.readouterr().out


def test_config_set_engine_roundtrip(tmp_path, monkeypatch, capsys):
    cfg = tmp_path / ".unicore_tpu" / "engines.cfg"
    monkeypatch.setenv("UNICORE_TPU_ENGINES_CFG", str(cfg))
    cfg.parent.mkdir(parents=True)
    rc = main(["config", "--set-mafft", "builtin"])
    assert rc == 0
    assert cfg.exists()
    text = cfg.read_text()
    assert "# mafft=builtin" in text

    from unicore_tpu.runtime import registry
    overrides = registry.load_overrides(str(cfg))
    assert "mafft" not in overrides  # builtin = no override recorded


def test_profile_cli_runs(tmp_path, capsys):
    (tmp_path / "db.map").write_text("g1\tspe1\th\ng2\tspe2\th\n")
    (tmp_path / "clust.tsv").write_text("g1\tg1\ng1\tg2\n")
    rc = main([
        "profile", str(tmp_path / "db"), str(tmp_path / "clust.tsv"),
        str(tmp_path / "out"), "-v", "1",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "copiness.tsv").exists()
    assert (tmp_path / "out" / "g1.txt").exists()
