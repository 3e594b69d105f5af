"""AFDB table downloader: resumable, gzip-CRC-verified (file:// fixture,
zero egress).  Contract: afdb_lookup.rs:15-64."""

import gzip
import os

import pytest

from unicore_tpu.runtime.errors import UnicoreError
from unicore_tpu.seq.lookup import download_afdb_tables


@pytest.fixture
def table_host(tmp_path):
    host = tmp_path / "host"
    host.mkdir()
    (host / "00.tsv.gz").write_bytes(gzip.compress(b"aaaa\tDDDD\n"))
    (host / "ab.tsv.gz").write_bytes(gzip.compress(b"bbbb\tVVVV\n"))
    return f"file://{host}"


def test_download_and_resume(tmp_path, table_host):
    dest = str(tmp_path / "tables")
    n = download_afdb_tables(dest, base_url=table_host, assume_yes=True,
                             shards=["00", "ab"])
    assert n == 2
    assert open(os.path.join(dest, "md5", "00.tsv")).read() == "aaaa\tDDDD\n"
    assert open(os.path.join(dest, "md5", "ab.tsv")).read() == "bbbb\tVVVV\n"

    # resume: existing shards untouched (mtime preserved), zero fetched
    marker = os.path.join(dest, "md5", "00.tsv")
    before = os.path.getmtime(marker)
    n2 = download_afdb_tables(dest, base_url=table_host, assume_yes=True,
                              shards=["00", "ab"])
    assert n2 == 0
    assert os.path.getmtime(marker) == before


def test_corrupt_shard_rejected(tmp_path):
    host = tmp_path / "host"
    host.mkdir()
    blob = bytearray(gzip.compress(b"cccc\tLLLL\n" * 50))
    blob[-3] ^= 0xFF  # break the CRC32 trailer
    (host / "00.tsv.gz").write_bytes(bytes(blob))
    dest = str(tmp_path / "tables")
    with pytest.raises(UnicoreError):
        download_afdb_tables(dest, base_url=f"file://{host}",
                             assume_yes=True, shards=["00"])
    # no partial/final shard left behind
    assert not os.path.exists(os.path.join(dest, "md5", "00.tsv"))


def test_noninteractive_requires_consent(tmp_path, table_host):
    with pytest.raises(UnicoreError):
        download_afdb_tables(str(tmp_path / "t"), base_url=table_host,
                             assume_yes=False, shards=["00"])


def test_prostt5_downloader_resume_and_size_check(tmp_path):
    """ProstT5 weight fetcher (foldseek `databases ProstT5` analog):
    per-file resume + no partial files on failure."""
    from unicore_tpu.models.fetch import download_prostt5, maybe_download_prostt5

    host = tmp_path / "host"
    host.mkdir()
    (host / "config.json").write_text('{"d_model": 1024}')
    (host / "spiece.model").write_bytes(b"\x00sp")
    dest = str(tmp_path / "model")
    n = download_prostt5(dest, base_url=f"file://{host}",
                         files=["config.json", "spiece.model"])
    assert n == 2
    n2 = download_prostt5(dest, base_url=f"file://{host}",
                          files=["config.json", "spiece.model"])
    assert n2 == 0  # resume: everything present

    # missing remote file -> typed error, no .part litter
    with pytest.raises(UnicoreError):
        download_prostt5(dest, base_url=f"file://{host}", files=["nope.bin"])
    assert not any(f.endswith(".part") for f in os.listdir(dest))

    # gate: no env var -> no-op
    assert maybe_download_prostt5(dest) is False
