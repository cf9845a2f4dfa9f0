"""Hilbert encoding (Spark Column program vs Python twin vs classic
xy2d) and dissolve operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import hilbert as HB


def xy2d_classic(order: int, x: int, y: int) -> int:
    """Independent oracle: Wikipedia iterative Hilbert xy->d conversion."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbertPy:
    def test_origin_and_first_steps(self):
        assert HB.hilbert_code_py(0, 0) == 0
        assert HB.hilbert_code_py(1, 0) == 1
        assert HB.hilbert_code_py(0, 1) == 3

    def test_vs_classic_random(self):
        rng = np.random.default_rng(9)
        for _ in range(500):
            x = int(rng.integers(0, 65536))
            y = int(rng.integers(0, 65536))
            assert HB.hilbert_code_py(x, y) == xy2d_classic(65536, x, y)

    def test_bijective_on_coarse_grid(self):
        codes = {
            HB.hilbert_code_py(x, y)
            for x in range(0, 65536, 4096)
            for y in range(0, 65536, 4096)
        }
        assert len(codes) == 16 * 16


def test_hilbert_spark_matches_python(spark):
    rng = np.random.default_rng(4)
    rows = [(int(rng.integers(0, 65536)), int(rng.integers(0, 65536))) for _ in range(300)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    out = HB.with_hilbert_code(df, "x", "y").collect()
    for r in out:
        assert r.hcode == HB.hilbert_code_py(r.x, r.y), (r.x, r.y)


# ---------------------------------------------------------------- dissolve


def _box_wkb(x0, y0, x1, y1):
    import struct

    ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    out = [struct.pack("<BII", 1, 3, 1), struct.pack("<I", 5)]
    out += [struct.pack("<dd", x, y) for x, y in ring]
    return b"".join(out)


def test_dissolve_disjoint_boxes(spark):
    from gdal_spark.operators.dissolve import dissolve

    rows = [
        ("a", _box_wkb(0, 0, 2, 2)),
        ("a", _box_wkb(10, 0, 12, 3)),
        ("b", _box_wkb(0, 0, 4, 4)),
    ]
    df = spark.createDataFrame(rows, "grp: string, wkb: binary")
    got = {r.grp: (r.n_parts, r.area) for r in dissolve(df, ["grp"]).collect()}
    assert got["a"] == (2, pytest.approx(4.0 + 6.0))
    assert got["b"] == (1, pytest.approx(16.0))


def test_dissolve_overlapping_boxes_union_area(spark):
    from gdal_spark.operators.dissolve import dissolve

    # two 4x4 boxes overlapping in a 2x4 strip: union area = 16+16-8 = 24
    rows = [("g", _box_wkb(0, 0, 4, 4)), ("g", _box_wkb(2, 0, 6, 4))]
    df = spark.createDataFrame(rows, "grp: string, wkb: binary")
    r = dissolve(df, ["grp"]).collect()[0]
    assert r.area == pytest.approx(24.0)


def test_union_wkbs_mixed(spark):
    from gdal_spark.operators.dissolve import union_wkbs

    region, n, area = union_wkbs(
        [_box_wkb(0, 0, 1, 1), _box_wkb(5, 5, 7, 7), _box_wkb(6, 6, 8, 8)]
    )
    assert area == pytest.approx(1.0 + 4.0 + 4.0 - 1.0)
