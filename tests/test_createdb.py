import hashlib
import os

import pytest

from unicore_tpu.cli import build_parser, resolve
from unicore_tpu.io.seqdb import SeqDB
from unicore_tpu.modules import createdb
from unicore_tpu.runtime import errors as err


def _args(input_path, output, **kw):
    argv = ["createdb", str(input_path), str(output), "mock"]
    for k, v in kw.items():
        argv.append(k)
        if v is not None:
            argv.append(str(v))
    return resolve(build_parser().parse_args(argv))


def test_createdb_mock(tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "spec1.fa").write_text(">p1 some desc\nMIRGGDIAKG\n>p2\nACDEFGHIKL\n")
    (ind / "spec2.fasta").write_text(">q1\nMIRGGDIAKG\n>tiny\nA\n")
    out = tmp_path / "db" / "proteome_db"
    createdb.run(_args(ind, out))

    db = SeqDB.read(str(out))
    # identical sequence across species collapses to one record
    assert len(db) == 2
    assert db.has_ss
    for aa, ss in zip(db.aa_seqs, db.ss_seqs):
        assert len(aa) == len(ss)

    # map file: one line per occurrence, sanitized headers, hashed names
    rows = [l.split("\t") for l in open(str(out) + ".map").read().splitlines()]
    assert len(rows) == 3  # tiny dropped (len<2)
    h = "unicore_" + hashlib.md5(b"MIRGGDIAKG").hexdigest()[:10]
    assert rows[0][0] == h
    assert rows[0][1] == "spec1"
    assert rows[0][2] == "p1_some_desc"

    # combined fasta written next to the db
    assert os.path.isfile(tmp_path / "db" / "combined_aa.fasta")
    # checkpoint done
    assert open(tmp_path / "db" / "createdb.chk").read() == "1"


def test_createdb_refuses_rerun_without_overwrite(tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "s.fa").write_text(">p\nACDEFGH\n")
    out = tmp_path / "db" / "proteome_db"
    createdb.run(_args(ind, out))
    with pytest.raises(err.UnicoreError):
        createdb.run(_args(ind, out))
    # --overwrite allows re-run
    args = _args(ind, out)
    args.createdb_overwrite = True
    createdb.run(args)


def test_createdb_max_len(tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "s.fa").write_text(">short\nACDEF\n>long\n" + "A" * 100 + "\n")
    out = tmp_path / "db" / "proteome_db"
    args = _args(ind, out)
    args.createdb_max_len = 50
    createdb.run(args)
    db = SeqDB.read(str(out))
    assert db.aa_seqs == ["ACDEF"]


def test_mock_predictor_deterministic_and_similar():
    from unicore_tpu.models.mock import MockProstT5

    m = MockProstT5()
    s1 = "MIRGGDIAKGTVLLHKGAPYLVVEREFVNPGKGAAFARVKMK"
    s2 = "MIRGGDIAKGTVLLHKGAPYLVVEREFVNPGKGAAFARVKMR"  # one mutation
    a, b = m.predict([s1, s2])
    a2 = m.predict([s1])[0]
    assert a == a2
    assert len(a) == len(s1)
    # one AA mutation perturbs at most 3 trigram windows
    diff = sum(1 for x, y in zip(a, b) if x != y)
    assert diff <= 3
