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
