"""SOZip reader/writer tests.

Mirrors the reference's autotest/utilities/test_sozip.py cases
(--list, create, validate, append-without-index) plus the Spark
parallel-line-read path, and reads the reference's own committed SOZip
fixture gcore/data/zero_5GB_sozip_of_sozip.zip (the same file its
test_sozip_list checks: member zero_5GB.bin.zip, 5232873 bytes,
chunk 32768, index valid)."""

from __future__ import annotations

import io
import zipfile

import pytest

from gdal_spark.sources import sozip as S

REF_FIXTURE = "/root/reference/autotest/gcore/data/zero_5GB_sozip_of_sozip.zip"


def _payload(n_lines: int) -> bytes:
    return (
        "\n".join(f"line-{i:06d}-" + "x" * (i % 97) for i in range(n_lines))
        + "\n"
    ).encode()


def test_reference_fixture_list():
    lst = S.sozip_list(REF_FIXTURE)
    assert len(lst) == 1
    e = lst[0]
    # the values the reference's own test_sozip_list asserts
    assert e["name"] == "zero_5GB.bin.zip"
    assert e["usize"] == 5232873
    assert e["sozip_found"] and e["sozip_valid"]
    assert e["chunk_size"] == 32768


def test_reference_fixture_validate():
    v = S.sozip_validate(REF_FIXTURE, "zero_5GB.bin.zip")
    assert v["valid"], v["reason"]
    assert v["nchunks"] == (5232873 + 32767) // 32768


def test_reference_fixture_chunk_reads():
    info = S.sozip_member_info(REF_FIXTURE, "zero_5GB.bin.zip")
    ranges = S.sozip_chunk_ranges(REF_FIXTURE, info)
    assert ranges[0][1] == 0 and ranges[-1][2] == info["csize"]
    chunks = S.sozip_read_chunks(REF_FIXTURE, info, [ranges[0], ranges[5]])
    assert len(chunks[0]) == 32768 and len(chunks[1]) == 32768
    # chunk 0 of the inner zip starts with the local-file-header magic
    assert chunks[0][:4] == b"PK\x03\x04"


def test_roundtrip_various_sizes():
    for n in (1, 100, 5000):
        data = _payload(n)
        buf = io.BytesIO()
        S.sozip_create(buf, [("a.txt", data)], chunk_size=1024, enabled="YES")
        b = buf.getvalue()
        if len(data) > 1024:
            v = S.sozip_validate(b, "a.txt")
            assert v["valid"], v["reason"]
        assert S.sozip_read_member(b, "a.txt") == data


def test_exact_chunk_multiple():
    data = b"z" * (4 * 4096)
    buf = io.BytesIO()
    S.sozip_create(buf, [("m.bin", data)], chunk_size=4096, enabled="YES")
    b = buf.getvalue()
    info = S.sozip_member_info(b, "m.bin")
    assert info["sozip_valid"] and info["nchunks"] == 4
    assert S.sozip_validate(b, "m.bin")["valid"]
    assert S.sozip_read_member(b, "m.bin") == data


def test_auto_mode_threshold():
    """AUTO adds the index only above min_file_size — the reference's
    test_sozip_append expectation (small member has no SOZIP_VALID)."""
    small, big = _payload(10), _payload(40000)
    buf = io.BytesIO()
    S.sozip_create(
        buf, [("small.txt", small), ("big.txt", big)],
        chunk_size=4096, enabled="AUTO", min_file_size=100_000,
    )
    b = buf.getvalue()
    assert not S.sozip_member_info(b, "small.txt")["sozip_found"]
    info = S.sozip_member_info(b, "big.txt")
    assert info["sozip_found"] == (len(big) > 100_000)


def test_hidden_index_and_zipfile_interop():
    data = _payload(5000)
    buf = io.BytesIO()
    S.sozip_create(buf, [("doc/a.txt", data)], chunk_size=2048, enabled="YES")
    b = buf.getvalue()
    z = zipfile.ZipFile(io.BytesIO(b))
    # the .sozip.idx member is invisible (not in the central directory)
    assert z.namelist() == ["doc/a.txt"]
    assert z.read("doc/a.txt") == data
    # but physically present right after the member, named .a.txt.sozip.idx
    assert b".a.txt.sozip.idx" in b


def test_corrupt_index_rejected():
    data = _payload(5000)
    buf = io.BytesIO()
    S.sozip_create(buf, [("a.txt", data)], chunk_size=1024, enabled="YES")
    b = bytearray(buf.getvalue())
    info = S.sozip_member_info(bytes(b), "a.txt")
    # flip an offset in the index to a non-monotonic value
    base = info["index_data_start"] + 32
    b[base + 8 : base + 16] = b"\x01\x00\x00\x00\x00\x00\x00\x00"
    v = S.sozip_validate(bytes(b), "a.txt")
    assert not v["valid"]


@pytest.mark.usefixtures("spark")
def test_lines_df_parallel(spark, tmp_path):
    n = 20000
    data = _payload(n)
    p = str(tmp_path / "lines.zip")
    S.sozip_create(p, [("lines.txt", data)], chunk_size=2048, enabled="YES")
    df = S.sozip_lines_df(spark, p, "lines.txt")
    got = sorted(r.line for r in df.collect())
    want = sorted(data.decode().splitlines())
    assert len(got) == n
    assert got == want


@pytest.mark.usefixtures("spark")
def test_lines_df_line_spans_many_chunks(spark, tmp_path):
    """One line longer than several chunks: the owning task must read
    forward through multiple chunks to finish it."""
    lines = [b"a" * 10, b"B" * 9000, b"c" * 10, b"d" * 7000, b"e" * 5]
    data = b"\n".join(lines) + b"\n"
    p = str(tmp_path / "long.zip")
    S.sozip_create(p, [("t.txt", data)], chunk_size=1024, enabled="YES")
    df = S.sozip_lines_df(spark, p, "t.txt")
    got = sorted(r.line for r in df.collect())
    assert got == sorted(ln.decode() for ln in lines)


def test_empty_member_index_validation():
    """unc == 0 must not be treated as ((0-1)//chunk) == -1 offsets
    (the reference uses unsigned math; an empty member stores zero
    offsets)."""
    buf = io.BytesIO()
    S.sozip_create(buf, [("empty.txt", b"")], chunk_size=1024,
                   enabled="YES")
    b = buf.getvalue()
    info = S.sozip_member_info(b, "empty.txt")
    if info.get("sozip_found"):
        # if the writer indexes empty members, the validator must agree
        assert info["sozip_valid"]
        assert info["nchunks"] == 0
    assert S.sozip_read_member(b, "empty.txt") == b""
