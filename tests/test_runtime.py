"""Runtime layer tests: registry, errors, logging gates, lookup gating,
profiling counters."""

import os

import pytest

from unicore_tpu.runtime import errors as err
from unicore_tpu.runtime import logging as msg
from unicore_tpu.runtime import profiling, registry


def test_registry_names_and_defaults():
    for name in ("foldseek", "foldmason", "mafft", "iqtree", "fasttree", "raxml-ng"):
        assert registry.has(name), name
    with pytest.raises(err.UnicoreError):
        registry.register("not-a-tool", lambda: None)


def test_error_codes_match_reference():
    # envs/error_handler.rs:5-14
    assert err.ERR_UNKNOWN_MODULE == 0x01
    assert err.ERR_GENERAL == 0x10
    assert err.ERR_INTERRUPTED == 0x50
    with pytest.raises(err.UnicoreError) as e:
        err.error(err.ERR_FILE_NOT_FOUND, "x.fa")
    assert e.value.err_code == err.ERR_FILE_NOT_FOUND


def test_verbosity_gating(capsys):
    msg.set_verbosity(2)
    msg.println_message("info-msg", 3)
    msg.println_message("warn-msg", 2)
    out = capsys.readouterr().out
    assert "warn-msg" in out and "info-msg" not in out
    msg.set_verbosity(3)


def test_afdb_lookup_missing_table_errors(tmp_path):
    from unicore_tpu.seq.lookup import split_by_lookup

    with pytest.raises(err.UnicoreError):
        split_by_lookup({"a": "ACDEF"}, str(tmp_path / "nope"), custom=False, out_dir=str(tmp_path))


def test_afdb_lookup_with_table(tmp_path):
    import hashlib
    from unicore_tpu.seq.lookup import split_by_lookup

    table_dir = tmp_path / "tables"
    table_dir.mkdir()
    seq = "ACDEFGHIKL"
    digest = hashlib.md5((seq + "\n").encode()).hexdigest()
    # all 256 shards must exist per the reference layout; only write the
    # needed one plus the 00 probe
    (table_dir / "00.tsv").write_text("")
    (table_dir / f"{digest[:2]}.tsv").write_text(f"{digest}\tDDDDDDDDDD\n")
    other = hashlib.md5(b"WWWWYYYY\n").hexdigest()
    (table_dir / f"{other[:2]}.tsv").write_text("")
    resolved, remaining = split_by_lookup(
        {"unicore_x": seq, "unicore_y": "WWWWYYYY"},
        str(table_dir), custom=False, out_dir=str(tmp_path),
    )
    assert resolved == {"unicore_x": (seq, "DDDDDDDDDD")}
    assert list(remaining) == ["unicore_y"]


def test_profiling_counters():
    profiling.add_counter("test.x", 2.0)
    profiling.add_counter("test.x", 3.0)
    assert profiling.get_counters()["test.x"] == 5.0
    with profiling.stage("unit-test-stage"):
        pass
    assert "stage.unit-test-stage.seconds" in profiling.get_counters()
