"""GTI tile index: pruned windowed mosaic reads (sources/gti.py) vs a
single-machine composite oracle using the same warp kernel.

Reference semantics: frmts/gti/gdaltileindexdataset.cpp — index layer
spatial filter -> open only intersecting tiles -> painter's composite in
SORT_FIELD order.
"""

import numpy as np
import pytest

from gdal_spark import datagen
from gdal_spark.sources import gti


@pytest.fixture(scope="module")
def corpus(spark):
    imgs = datagen.with_footprint(
        datagen.images_df(spark, 48, with_pixels=True, size_cap=32)
    )
    rows = imgs.collect()
    return imgs, rows


def _oracle(rows, window, out_w, out_h):
    from gdal_spark.functions import codecs
    from gdal_spark.raster.warp import warp_array

    x0, y0, x1, y1 = window
    px, py = (x1 - x0) / out_w, (y1 - y0) / out_h
    dst_gt = (x0, px, 0.0, y1, 0.0, -py)
    canvas = np.zeros((out_h, out_w, 3), np.uint8)
    painted = np.zeros((out_h, out_w), bool)
    hits = []
    for r in sorted(rows, key=lambda r: r.image_id):
        if not (r.lon_min < x1 and r.lon_max > x0 and r.lat_min < y1 and r.lat_max > y0):
            continue
        arr = codecs.decode_image(bytes(r.bytes), r.fmt)
        th, tw = arr.shape[:2]
        src_gt = (r.lon_min, (r.lon_max - r.lon_min) / tw, 0.0,
                  r.lat_max, 0.0, -(r.lat_max - r.lat_min) / th)
        warped, mask = warp_array(
            arr, src_gt, dst_gt, out_h, out_w,
            src_crs="EPSG:4326", dst_crs="EPSG:4326",
            resample="near", return_mask=True,
        )
        if mask.any():
            hits.append(r.image_id)
        canvas[mask] = warped[mask]
        painted |= mask
    return canvas, painted, hits


def _window_around(rows, k=3):
    """bbox union of the first k footprints, padded 10%."""
    sel = sorted(rows, key=lambda r: r.image_id)[:k]
    x0 = min(r.lon_min for r in sel); x1 = max(r.lon_max for r in sel)  # noqa: E702
    y0 = min(r.lat_min for r in sel); y1 = max(r.lat_max for r in sel)  # noqa: E702
    dx, dy = (x1 - x0) * 0.1, (y1 - y0) * 0.1
    return (x0 - dx, y0 - dy, x1 + dx, y1 + dy)


def test_window_read_matches_oracle(spark, corpus):
    imgs, rows = corpus
    window = _window_around(rows)
    out_w, out_h = 200, 144
    index = gti.build_index(imgs)
    blocks = gti.read_window(
        index, imgs, window, out_w, out_h, block=64
    ).collect()
    canvas, painted, hits = _oracle(rows, window, out_w, out_h)
    assert blocks, "window over 3 footprints must hit at least one block"
    got = np.zeros_like(canvas)
    got_mask = np.zeros((out_h, out_w), bool)
    for b in blocks:
        bh = min(64, out_h - b.by * 64)
        bw = min(64, out_w - b.bx * 64)
        got[b.by * 64 : b.by * 64 + bh, b.bx * 64 : b.bx * 64 + bw] = (
            np.frombuffer(bytes(b.rgb), np.uint8).reshape(bh, bw, 3)
        )
        got_mask[b.by * 64 : b.by * 64 + bh, b.bx * 64 : b.bx * 64 + bw] = True
        assert set(b.src_ids) <= set(hits)
    # blocks the engine never emitted must be empty in the oracle too
    assert not painted[~got_mask].any()
    np.testing.assert_array_equal(got[got_mask], canvas[got_mask])


def test_candidate_pruning_pushes_down(spark, corpus, tmp_path):
    imgs, rows = corpus
    index = gti.build_index(imgs)
    path = str(tmp_path / "gti_index")
    gti.write_index(index, path)
    idx = gti.read_index(spark, path)
    window = _window_around(rows, k=2)
    cand = gti.window_candidates(idx, window)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "minx" in plan
    expected = {
        r.image_id
        for r in rows
        if r.lon_min < window[2] and r.lon_max > window[0]
        and r.lat_min < window[3] and r.lat_max > window[1]
    }
    assert {r.location for r in cand.collect()} == expected


def test_index_is_hilbert_clustered(spark, corpus):
    imgs, _ = corpus
    idx = gti.build_index(imgs).toPandas()
    assert list(idx.columns) == gti.INDEX_COLS + ["hcode"]
    # hilbert codes monotone within each written partition
    assert (idx["hcode"].to_numpy() >= 0).all()


def test_gdal_tindex_four_tiles(spark, tmp_path):
    """gdaltindex parity (autotest/utilities/test_gdaltindex_lib.py
    test_gdaltindex_lib_basic + already_existing_rasters): 4 features,
    reference ring order, location attribute, duplicate adds skipped."""
    import numpy as np

    from gdal_spark.functions import wkb as W
    from gdal_spark.functions.tiff import tiff_encode
    from gdal_spark.sources.gti import gdal_tindex
    from gdal_spark.sources.vector_formats import read_shapefile

    # the four_tiles fixture grid (10x10 at 0.1 deg)
    gts = [(49, 2), (49, 3), (48, 2), (48, 3)]
    paths = []
    for i, (x, y) in enumerate(gts):
        p = str(tmp_path / f"gdaltindex{i + 1}.tif")
        open(p, "wb").write(
            tiff_encode(np.zeros((10, 10), np.uint8),
                        geotransform=(x, 0.1, 0, y, 0, -0.1))
        )
        paths.append(p)

    shp = str(tmp_path / "tileindex.shp")
    assert gdal_tindex(spark, shp, paths[:2]) == 2
    assert gdal_tindex(spark, shp, paths[2:]) == 2

    rows = read_shapefile(spark, shp).orderBy("fid").collect()
    assert len(rows) == 4
    assert [r["location"] for r in rows] == paths

    # expected_wkts from the autotest, as ring coordinates
    expected = [
        [(49, 2), (50, 2), (50, 1), (49, 1), (49, 2)],
        [(49, 3), (50, 3), (50, 2), (49, 2), (49, 3)],
        [(48, 2), (49, 2), (49, 1), (48, 1), (48, 2)],
        [(48, 3), (49, 3), (49, 2), (48, 2), (48, 3)],
    ]
    for r, exp in zip(rows, expected):
        rings = W.polygon_rings(bytes(r["wkb"]))
        got = [tuple(pt) for pt in rings[0][0]]
        assert got == [(float(a), float(b)) for a, b in exp]

    # adding the same rasters again is a no-op
    assert gdal_tindex(spark, shp, paths) == 0
    assert read_shapefile(spark, shp).count() == 4
