"""MapInfo TAB binary reader vs the reference autotest fixtures
(autotest/ogr/data/mitab): geometry parity against the golden CSV and
against the engine's own MIF reader on the same dataset."""

from __future__ import annotations

import csv
import os
import re

import numpy as np
import pytest

from gdal_spark.sources.tabfile import tab_read

D = "/root/reference/autotest/ogr/data/mitab"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing")


def _load(base: str, upper: bool = False) -> dict:
    exts = ("TAB", "DAT", "MAP", "ID") if upper else ("tab", "dat", "map",
                                                      "id")
    files = {}
    for ext in exts:
        p = os.path.join(D, f"{base}.{ext}")
        if os.path.exists(p):
            mode = "r" if ext.lower() == "tab" else "rb"
            with open(p, mode) as fh:
                files[ext.lower()] = fh.read()
    return files


def _nums(wkt: str) -> np.ndarray:
    return np.array([float(v) for v in
                     re.findall(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?", wkt)])


def test_all_geoms_vs_golden_csv():
    """Every feature's decoded geometry matches the reference golden
    dump coordinate-by-coordinate."""
    feats = tab_read(_load("all_geoms"))
    with open(os.path.join(D, "all_geoms.mif.golden.csv")) as fh:
        golden = list(csv.DictReader(fh))
    assert len(feats) == len(golden) == 16
    for f, g in zip(feats, golden):
        want = g["WKT"]
        got = f["wkt"]
        # same geometry kind
        assert got.split(" ")[0].split("(")[0] == \
            want.split(" ")[0].split("(")[0], (got, want)
        a, b = _nums(got), _nums(want)
        assert a.shape == b.shape, (got[:60], want[:60])
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_all_geoms_matches_own_mif_reader():
    """Cross-format: the binary TAB decode equals the MIF text decode
    of the same dataset (the engine's two MapInfo paths agree)."""
    from gdal_spark.sources.mif import parse_mif

    feats = tab_read(_load("all_geoms"))
    with open(os.path.join(D, "all_geoms.mif")) as fh:
        mif_feats = parse_mif(fh.read())
    assert len(feats) == len(mif_feats)
    for f, m in zip(feats, mif_feats):
        a, b = _nums(f["wkt"]), _nums(m["wkt"])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_dat_attributes():
    feats = tab_read(_load("first_table"))
    assert len(feats) > 0
    row = feats[0]["fields"]
    assert isinstance(row, dict) and len(row) > 0


def test_aspatial_table():
    files = _load("aspatial-table")
    feats = tab_read(files)
    assert len(feats) > 0
    # no .map/.id in files? then all geometries are None
    if "map" not in files:
        assert all(f["wkt"] is None for f in feats)


def test_uppercase_extensions():
    """Upper-case fileset parses; its .dat holds no complete record
    (66 bytes against a 65-byte header + 11-byte records)."""
    files = _load("lambert93_francais", upper=True)
    if not files.get("dat"):
        pytest.skip("fixture missing")
    feats = tab_read(files)
    assert feats == []
