"""XLS (BIFF8/OLE2) reader vs the reference autotest
(autotest/ogr/ogr_xls.py, data/xls/test972000xp.xls)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from gdal_spark.sources.xls import xls_read

FIX = "/root/reference/autotest/ogr/data/xls/test972000xp.xls"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIX), reason="reference autotest data missing")


@pytest.fixture(scope="module")
def data() -> bytes:
    with open(FIX, "rb") as fh:
        return fh.read()


def test_layer_and_schema(data):
    """test_ogr_xls_1: one non-empty sheet, 5 typed columns."""
    book = xls_read(data)
    assert list(book) == ["Feuille1"]  # empty sheets surface no layer
    sh = book["Feuille1"]
    assert [t for _, t in sh["fields"]] == [
        "integer", "real", "string", "date", "datetime"]
    assert [n for n, _ in sh["fields"]] == [
        "FirstCol", "SecondCol", "ThirdCol", "FourthCol", "FifthCol"]
    assert len(sh["rows"]) == 3


def test_first_feature_values(data):
    sh = xls_read(data)["Feuille1"]
    r = sh["rows"][0]
    assert r["FirstCol"] == 1
    assert float(r["SecondCol"]) == 1.0
    assert r["ThirdCol"] is None
    assert r["FourthCol"] == dt.date(1980, 1, 1)
    # stored as a date cell; the promoted field type renders it
    # 1980/01/01 00:00:00 in the reference
    assert r["FifthCol"] == dt.date(1980, 1, 1)


def test_later_rows(data):
    sh = xls_read(data)["Feuille1"]
    r2 = sh["rows"][1]
    assert r2["SecondCol"] == 2.5
    assert r2["ThirdCol"] == "Val2"
    assert r2["FifthCol"] == dt.datetime(1980, 1, 2, 12, 34, 56)
    r3 = sh["rows"][2]
    assert r3["ThirdCol"] == "Val_avec_é"
    assert r3["FifthCol"] == dt.time(12, 34, 56)


def test_headers_disabled(data):
    """test_ogr_xls_2: OGR_XLS_HEADERS=DISABLE -> 4 features."""
    sh = xls_read(data, headers=False)["Feuille1"]
    assert len(sh["rows"]) == 4
    assert [n for n, _ in sh["fields"]] == [
        f"Field{i}" for i in range(1, 6)]


def test_rejects_non_ole():
    with pytest.raises(ValueError):
        xls_read(b"PK\x03\x04 not ole")


# -- SST continuation ([MS-XLS] 2.5.293) ---------------------------------

def _sst_seg_tests():
    from gdal_spark.sources.xls import _sst_strings
    return _sst_strings


def test_sst_continue_whole_string_boundary():
    """A new string starting exactly at a CONTINUE boundary has its own
    header there — no extra flag byte."""
    import struct
    from gdal_spark.sources.xls import _sst_strings

    s1, s2 = "alpha", "bravo"
    body = struct.pack("<II", 2, 2)
    body += struct.pack("<HB", len(s1), 0) + s1.encode("latin-1")
    cont = struct.pack("<HB", len(s2), 0) + s2.encode("latin-1")
    assert _sst_strings(body, [cont]) == [s1, s2]


def test_sst_continue_mid_string_flag_change():
    """Character data split mid-string; the continuation re-declares
    fHighByte and may switch from compressed to utf-16."""
    import struct
    from gdal_spark.sources.xls import _sst_strings

    text = "hello WORLD"
    head, tail = text[:5], text[5:]
    body = struct.pack("<II", 1, 1)
    body += struct.pack("<HB", len(text), 0) + head.encode("latin-1")
    # continuation: flag byte 1 (high bytes) + utf-16 tail
    cont = b"\x01" + tail.encode("utf-16-le")
    assert _sst_strings(body, [cont]) == [text]


def test_sst_continue_multi_segment_and_richext():
    """Rich-run and ExtRst byte data span boundaries without flag
    bytes; character data split twice re-reads the flag each time."""
    import struct
    from gdal_spark.sources.xls import _sst_strings

    text = "abcdefgh"
    body = struct.pack("<II", 2, 2)
    # string 1: rich (2 runs) + ext (3 bytes), chars split at 3 and 6
    body += struct.pack("<HB", len(text), 0b1100)
    body += struct.pack("<H", 2) + struct.pack("<I", 3)
    body += text[:3].encode("latin-1")
    c1 = b"\x00" + text[3:6].encode("latin-1")
    # second split, then runs (8 bytes) split across c2/c3, ext, string 2
    c2 = b"\x00" + text[6:].encode("latin-1") + b"\x00" * 5
    c3 = b"\x00" * 3 + b"\x00" * 3 + struct.pack("<HB", 2, 1) + \
        "é!".encode("utf-16-le")
    assert _sst_strings(body, [c1, c2, c3]) == [text, "é!"]
