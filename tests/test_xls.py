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
