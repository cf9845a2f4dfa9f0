"""GeoParquet sink/scan: geo metadata, bbox covering, two-level pruning.

Spec shape per the reference's Parquet driver
(ogr/ogrsf_frmts/parquet/ogrparquetwriterlayer.cpp: the ``geo``
file-metadata JSON + the GeoParquet 1.1 covering bbox struct)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions.wkb import write_polygon
from gdal_spark.sources.geoparquet import (
    geo_metadata,
    pruned_file_count,
    read_geoparquet,
    write_geoparquet,
)


def _box_wkb(x0, y0, x1, y1):
    ring = np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )
    return write_polygon([ring])


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """400 small boxes in a 20x20 lon/lat grid cell layout."""
    rows = []
    for i in range(400):
        gx, gy = i % 20, i // 20
        x0, y0 = -100.0 + gx * 2.0, 10.0 + gy * 1.5
        rows.append((i, f"f{i}", bytearray(_box_wkb(x0, y0, x0 + 1.0, y0 + 1.0))))
    df = spark.createDataFrame(rows, "fid int, name string, wkb binary")
    path = str(tmp_path_factory.mktemp("gpq") / "boxes")
    manifest = write_geoparquet(df, path, num_files=8, row_group_rows=16)
    return path, manifest, rows


def test_manifest_and_geo_metadata(store):
    path, manifest, rows = store
    assert sum(m["nrows"] for m in manifest) == 400
    for m in manifest:
        meta = geo_metadata(m["file"])
        assert meta["version"] == "1.1.0"
        col = meta["columns"][meta["primary_column"]]
        assert col["encoding"] == "WKB"
        assert col["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]
        # file-level bbox matches the manifest
        assert col["bbox"] == [m["xmin"], m["ymin"], m["xmax"], m["ymax"]]


def test_full_scan_roundtrip(spark, store):
    path, _, rows = store
    got = read_geoparquet(spark, path).orderBy("fid")
    assert got.count() == 400
    r0 = got.first()
    assert r0.fid == 0 and bytes(r0.wkb) == bytes(rows[0][2])
    assert r0.bbox.xmin == -100.0 and r0.bbox.ymax == 11.0


def test_bbox_query_matches_brute_force(spark, store):
    path, _, rows = store
    window = (-95.0, 12.0, -88.0, 20.0)
    got = sorted(
        r.fid for r in read_geoparquet(spark, path, bbox=window).collect()
    )
    expect = []
    for fid, _, wkb in rows:
        gx, gy = fid % 20, fid // 20
        x0, y0 = -100.0 + gx * 2.0, 10.0 + gy * 1.5
        if (
            x0 <= window[2]
            and x0 + 1.0 >= window[0]
            and y0 <= window[3]
            and y0 + 1.0 >= window[1]
        ):
            expect.append(fid)
    assert got == sorted(expect)
    assert got  # non-vacuous


def test_file_pruning_skips_files(store):
    path, _, _ = store
    # hilbert clustering makes a small corner window skip most files
    kept, total = pruned_file_count(path, (-100.0, 10.0, -99.0, 11.0))
    assert total == 8
    assert kept < total
    # a window outside the data prunes everything
    kept0, _ = pruned_file_count(path, (500.0, 500.0, 501.0, 501.0))
    assert kept0 == 0


def test_empty_window_returns_empty_same_schema(spark, store):
    path, _, _ = store
    df = read_geoparquet(spark, path, bbox=(500.0, 500.0, 501.0, 501.0))
    assert df.count() == 0
    assert set(df.columns) == {"fid", "name", "wkb", "bbox"}


def test_rowgroup_stats_are_spatially_tight(store):
    """Hilbert sort means each row group's bbox.xmin min/max stats span a
    small window — the statistic parquet prunes row groups with."""
    import pyarrow.parquet as pq

    path, manifest, _ = store
    f = pq.ParquetFile(manifest[0]["file"])
    idx = f.schema_arrow.names.index("bbox")
    spans = []
    for rg in range(f.metadata.num_row_groups):
        md = f.metadata.row_group(rg)
        stats = {
            md.column(c).path_in_schema: md.column(c).statistics
            for c in range(md.num_columns)
        }
        s = stats.get("bbox.xmin")
        if s is not None and s.has_min_max:
            spans.append(s.max - s.min)
    assert spans, "parquet row-group statistics missing for bbox.xmin"
    # data spans 40 degrees of longitude; clustered groups must be tighter
    assert sum(spans) / len(spans) < 40.0 * 0.8


def test_filter_pushdown_in_plan(spark, store):
    path, _, _ = store
    df = read_geoparquet(spark, path, bbox=(-95.0, 12.0, -88.0, 20.0))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bbox.xmin" in plan
