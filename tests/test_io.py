import os

from unicore_tpu.io import fasta
from unicore_tpu.io.mapfile import hashed_name, sanitize_header
from unicore_tpu.io.seqdb import SeqDB, concatdbs, mvdb, read_db, rmdb
from unicore_tpu.runtime import checkpoint as chkpnt


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "x.fasta")
    data = {"seq1 desc": "ACDEFG", "seq2": "KLMNPQ"}
    fasta.write_fasta(p, data)
    assert fasta.read_fasta(p) == data


def test_fasta_multiline_and_dup(tmp_path):
    p = str(tmp_path / "x.fasta")
    with open(p, "w") as f:
        f.write(">a\nAC\nDE\n>a\nGG\n>b\nKK\n")
    out = fasta.read_fasta(p)
    # duplicate headers: last wins (HashMap insert semantics)
    assert out == {"a": "GG", "b": "KK"}


def test_sanitize_header():
    assert sanitize_header("sp|P1|X OS=A (b)/c;d:e,f=g") == "sp|P1|X_OS_A__b__c_d_e_f_g"


def test_hashed_name():
    # md5("MIRG")[:10]; name scheme from createdb.rs:104-106
    import hashlib
    h = hashlib.md5(b"MIRG").hexdigest()[:10]
    assert hashed_name("MIRG") == f"unicore_{h}"
    assert len(hashed_name("MIRG")) == len("unicore_") + 10


def test_seqdb_roundtrip(tmp_path):
    db_path = str(tmp_path / "db" / "proteome_db")
    db = SeqDB(
        names=["unicore_aaa", "unicore_bbb"],
        aa_seqs=["ACDEF", "KLMNP"],
        ss_seqs=["DDDDD", "VVVVV"],
    )
    db.write(db_path)
    back = SeqDB.read(db_path)
    assert back.names == db.names
    assert back.aa_seqs == db.aa_seqs
    assert back.ss_seqs == db.ss_seqs
    # raw layout matches the reference's reader expectations (NUL-separated)
    raw = open(db_path, "rb").read()
    assert raw == b"ACDEF\n\x00KLMNP\n\x00"
    assert read_db(db_path) == ["ACDEF", "KLMNP"]


def test_seqdb_utils(tmp_path):
    a = str(tmp_path / "a_db")
    b = str(tmp_path / "b_db")
    SeqDB(names=["n1"], aa_seqs=["AA"], ss_seqs=["DD"]).write(a)
    SeqDB(names=["n2"], aa_seqs=["CC"], ss_seqs=["VV"]).write(b)
    out = str(tmp_path / "m_db")
    concatdbs(a, b, out)
    merged = SeqDB.read(out)
    assert merged.names == ["n1", "n2"]
    mv = str(tmp_path / "moved_db")
    mvdb(out, mv)
    assert SeqDB.read(mv).aa_seqs == ["AA", "CC"]
    rmdb(mv)
    assert not os.path.exists(mv)


def test_checkpoint(tmp_path):
    p = str(tmp_path / "stage.chk")
    chkpnt.write_checkpoint(p, "0")
    assert not chkpnt.is_done(p)
    chkpnt.write_checkpoint(p, "1")
    assert chkpnt.is_done(p)
    assert chkpnt.read_checkpoint(p) == "1"


def test_write_cluster_db_reference_format(tmp_path):
    """--keep cluster db: rep-keyed index, member-id records, NUL framing
    readable by the reference's read_db (cluster.rs keep path)."""
    from unicore_tpu.io.seqdb import read_db, write_cluster_db

    p = str(tmp_path / "clu_cluster")
    write_cluster_db(p, {0: [0, 2], 5: [5]})
    # payload lines are the member ids, reference-readable
    assert read_db(p) == ["0", "2", "5"]
    idx = [ln.split("\t") for ln in open(p + ".index").read().splitlines()]
    assert [e[0] for e in idx] == ["0", "5"]  # keyed by representative id
    offs = [int(e[1]) for e in idx]
    lens = [int(e[2]) for e in idx]
    raw = open(p, "rb").read()
    assert raw[offs[0]:offs[0] + lens[0]] == b"0\n2\n\x00"
    assert raw[offs[1]:offs[1] + lens[1]] == b"5\n\x00"
    assert open(p + ".dbtype", "rb").read()[:1] == b"\x06"


def test_write_aln_db_reference_format(tmp_path):
    """search --keep-aln-db: query-keyed index, mmseqs alignment rows, NUL
    framing readable by the reference's read_db (search.rs:64-72 keep
    path)."""
    from unicore_tpu.align.engine import Hit
    from unicore_tpu.io.seqdb import read_db, write_aln_db

    hits = [
        Hit(qidx=0, tidx=3, score=120, qstart=0, qend=49, tstart=2, tend=51,
            evalue=1e-10, fident=0.82),
        Hit(qidx=0, tidx=1, score=60, qstart=5, qend=30, tstart=0, tend=25,
            evalue=1e-4, fident=0.45),
        Hit(qidx=2, tidx=2, score=200, qstart=0, qend=99, tstart=0, tend=99,
            evalue=0.0, fident=1.0),
    ]
    qlen = [50, 10, 100]
    tlen = [40, 26, 100, 60]
    p = str(tmp_path / "search_aln")
    write_aln_db(p, hits, qlen, tlen)

    # payload rows parse as "tKey score seqId eval qStart qEnd qLen tStart tEnd tLen"
    rows = [r.split() for r in read_db(p)]
    assert [r[0] for r in rows] == ["3", "1", "2"]
    assert rows[0] == ["3", "120", "0.820", "1.000E-10", "0", "49", "50", "2", "51", "60"]
    assert rows[2][6] == "100" and rows[2][9] == "100"
    idx = [ln.split("\t") for ln in open(p + ".index").read().splitlines()]
    assert [e[0] for e in idx] == ["0", "2"]  # keyed by query internal id
    offs, lens = [int(e[1]) for e in idx], [int(e[2]) for e in idx]
    raw = open(p, "rb").read()
    for o, ln in zip(offs, lens):
        assert raw[o:o + ln].endswith(b"\n\x00")
    assert open(p + ".dbtype", "rb").read()[:1] == b"\x05"
