"""XLSX + ODS spreadsheet drivers vs the reference autotest
(autotest/ogr/ogr_xlsx.py, ogr_ods.py — the shared check function)."""

import os

import pytest

from gdal_spark.sources.ods import ods_layers
from gdal_spark.sources.xlsx import xlsx_layers

D = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D + "/xlsx"), reason="reference autotest data missing"
)

EXPECTED_TYPES = ["string", "integer", "real", "real", "date", "datetime",
                  "real", "time", "real", "integer", "real", "datetime"]


def _check(layers):
    names = list(layers)
    assert len(names) == 8
    assert names[0] == "Feuille1"
    feats1, _ = layers["Feuille1"]
    assert len(feats1) == 26
    assert names[6] == "Feuille7"
    feats7, fields7 = layers["Feuille7"]
    assert len(fields7) == 12
    assert [t for _, t in fields7] == EXPECTED_TYPES
    f = feats7[0]
    keys = [k for k, _ in fields7]
    assert f[keys[0]] == "val"
    assert f[keys[1]] == 23
    assert f[keys[2]] == 3.45
    assert f[keys[3]] == 0.52
    assert f[keys[4]] == "2012/01/22"
    assert f[keys[5]] == "2012/01/22 18:49:00"
    assert feats7[1][keys[2]] is None


def test_xlsx_1():
    with open(os.path.join(D, "xlsx/test.xlsx"), "rb") as fh:
        _check(xlsx_layers(fh.read()))


def test_ods_1():
    with open(os.path.join(D, "ods/test.ods"), "rb") as fh:
        _check(ods_layers(fh.read()))


def test_ods_kspread():
    with open(os.path.join(D, "ods/test_kspread.ods"), "rb") as fh:
        layers = ods_layers(fh.read())
    assert "Feuille1" in list(layers)[0] or layers


def test_ods_repeated_col_at_end_of_row():
    with open(os.path.join(D, "ods/testrepeatedcolatendofrow.ods"),
              "rb") as fh:
        layers = ods_layers(fh.read())
    feats, fields = layers["Tabelle1"]
    assert len(fields) == 8
    assert len(feats) == 2


def test_xlsx_headers_disable():
    with open(os.path.join(D, "xlsx/test.xlsx"), "rb") as fh:
        data = fh.read()
    auto = xlsx_layers(data)["Feuille7"]
    forced_off = xlsx_layers(data, headers="DISABLE")["Feuille7"]
    assert len(forced_off[0]) == len(auto[0]) + 1  # header row kept
