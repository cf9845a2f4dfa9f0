"""VFK reader vs the reference autotest (autotest/ogr/ogr_vfk.py,
data/vfk/bylany.vfk)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.sources.vfk import VFKFile, vfk_read

PATH = "/root/reference/autotest/ogr/data/vfk/bylany.vfk"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATH), reason="reference autotest data missing")


@pytest.fixture(scope="module")
def ds() -> VFKFile:
    with open(PATH, "rb") as fh:
        return vfk_read(fh.read())


def test_layer_count_61(ds):
    """test_ogr_vfk_1: exactly 61 layers (the &B block schemas)."""
    assert len(ds.layers) == 61
    assert "PAR" in ds.layers and "SOBR" in ds.layers


def test_par_schema_and_count(ds):
    """PAR: 28 fields, 1 feature."""
    assert len(ds.schemas["PAR"]) == 28
    assert len(ds.rows["PAR"]) == 1


def test_par_polygon_envelope(ds):
    """test_ogr_vfk_2: polygon envelope area ~2010.5."""
    rings = ds.geometries("PAR")[0]
    assert rings is not None and len(rings) == 1
    ext = rings[0]
    # assembled ring is closed
    assert tuple(ext[0]) == tuple(ext[-1])
    area = (ext[:, 0].max() - ext[:, 0].min()) * (
        ext[:, 1].max() - ext[:, 1].min())
    assert area == pytest.approx(2010.5, abs=0.5)


def test_sobr_attribute_query(ds):
    """test_ogr_vfk_3: CISLO_BODU = 55 matches exactly one point."""
    hits = [r for r in ds.rows["SOBR"] if r["CISLO_BODU"] == 55]
    assert len(hits) == 1
    # S-JTSK mapping: (-Y, -X)
    g = ds.geometries("SOBR")
    i = ds.rows["SOBR"].index(hits[0])
    x, y = g[i]
    assert x == -hits[0]["SOURADNICE_Y"]
    assert y == -hits[0]["SOURADNICE_X"]


def test_sbp_line_lengths(ds):
    """test_ogr_vfk_4: the 5th SBP line has integer length 10."""
    lines = [ln for ln in ds.geometries("SBP") if ln is not None]
    assert len(lines) == 14
    ln = lines[4]
    length = float(np.sum(np.hypot(*(np.diff(ln, axis=0).T))))
    assert int(length) == 10


def test_hp_linestrings(ds):
    """test_ogr_vfk_5: every HP row resolves to a linestring."""
    geoms = ds.geometries("HP")
    assert len(geoms) == 13
    assert all(g is not None and len(g) >= 2 for g in geoms)


def test_header_and_codepage(ds):
    assert ds.header["VERZE"] == ["3.0"]
    assert ds.header["CODEPAGE"] == ["WE8ISO8859P2"]
    # latin2 name decoded
    assert ds.header["JMENO"][0].startswith("Helena Korbov")


def test_value_typing(ds):
    r = ds.rows["SOBR"][0]
    assert isinstance(r["ID"], int)
    assert isinstance(r["SOURADNICE_Y"], float)


def test_continuation_lines():
    txt = ('&HVERZE;"3.0"\n'
           "&BT1;ID N30;NAZEV T10\n"
           '&DT1;1;"ab¤\n'
           'cd"\n')
    f = VFKFile(txt)
    assert f.rows["T1"][0]["NAZEV"] == "ab cd"
