"""MapInfo MIF/MID parity (ogr/ogrsf_frmts/mitab via
autotest/ogr/ogr_mitab.py test 10 and the all_geoms.mif golden CSV)."""

import re

import numpy as np
import pytest

from gdal_spark.sources.mif import parse_mif, read_mif

MITAB = "/root/reference/autotest/ogr/data/mitab"


def test_small_mif_ogr_mitab_10():
    feats = parse_mif(
        open(f"{MITAB}/small.mif").read(), open(f"{MITAB}/small.mid").read()
    )
    f = feats[0]
    assert f["NAME"] == " S. 11th St."
    assert f["FLOODZONE"] == 10
    assert f["wkt"] == (
        "POLYGON ((407131.721 155322.441,407134.468 155329.616,"
        "407142.741 155327.242,407141.503 155322.467,"
        "407140.875 155320.049,407131.721 155322.441))"
    )
    # the doubled-quote escape of the MID format
    assert feats[1]["OWNER"] == 'Guarino "Chucky" Sandra'
    assert feats[1]["APPRAISED_VALUE"] == 62480.53


def test_all_geoms_golden_subset():
    feats = parse_mif(open(f"{MITAB}/all_geoms.mif").read())
    wkts = [f["wkt"] for f in feats]
    assert wkts[0] == "POINT (0 1)"
    assert wkts[1] == "POINT (2 3)"
    assert wkts[3] == "LINESTRING (0 1,2 3)"  # Line
    assert wkts[4] == "LINESTRING (0 1,2 3)"  # Pline (count on next line)
    assert wkts[5] == "LINESTRING (0 1,2 3)"  # Pline n
    assert wkts[6] == "MULTILINESTRING ((0 1,2 3),(3 4,5 6))"
    assert wkts[7] == "POLYGON ((-1 -1,1 -1,1 1,-1 1,-1 -1))"  # Rect

    # RoundRect / Ellipse / Arc / Arc / Text tessellations: numeric
    # vertex-for-vertex parity with all_geoms.mif.golden.csv rows 8-12
    import csv

    with open(f"{MITAB}/all_geoms.mif.golden.csv") as fh:
        golden = [r[0] for r in csv.reader(fh)][1:]

    def coords(wkt):
        nums = re.findall(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?", wkt)
        return np.array([float(v) for v in nums]).reshape(-1, 2)

    for i in range(8, 13):
        mine, ref = coords(wkts[i]), coords(golden[i])
        assert mine.shape == ref.shape, (i, mine.shape, ref.shape)
        np.testing.assert_allclose(mine, ref, atol=1e-12)
        assert wkts[i].split(" ")[0] == golden[i].split(" ")[0]

    assert wkts[13] == "MULTIPOINT ((0 1),(2 3))"
    assert wkts[14] == "POLYGON ((0 1,1 1,1 0,0 1))"  # Region
    assert wkts[15] == (
        "GEOMETRYCOLLECTION (POLYGON ((0 1,1 1,1 0,0 1)),"
        "LINESTRING (0 1,2 3),MULTIPOINT ((0 1),(2 3)))"
    )
    assert len(wkts) == 16


def test_region_holes_and_multipart():
    mif = """Version 300
Columns 0
Data
Region 2
4
0 0
10 0
10 10
0 0
4
1 1
2 1
2 2
1 1
Region 2
4
0 0
1 0
1 1
0 0
4
5 5
6 5
6 6
5 5
"""
    feats = parse_mif(mif)
    # hole contained in the outer -> single polygon with interior ring
    assert feats[0]["wkt"].startswith("POLYGON") and feats[0]["wkt"].count("(") == 3
    # disjoint rings -> multipolygon
    assert feats[1]["wkt"].startswith("MULTIPOLYGON")


def test_read_mif_distributed(spark):
    df = read_mif(spark, [f"{MITAB}/small.mif"])
    rows = df.orderBy("fid").collect()
    assert len(rows) == 2
    assert rows[0].wkt.startswith("POLYGON ((407131.721")
    assert rows[0].fields["NAME"] == " S. 11th St."
    assert rows[1].fields["OWNER"] == 'Guarino "Chucky" Sandra'
