"""gdal2tiles pipeline tests: assignment math, compositing, overview
orientation (independent cross-zoom oracle), resume, lineage."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark import datagen
from gdal_spark.functions import codecs
from gdal_spark.functions import mercator as M
from gdal_spark.functions import quality
from gdal_spark.raster.warp import footprint_gt, lonlat_to_meters_np, warp_array
from gdal_spark.tiles import pipeline as P

TZ = 9
N = 8


@pytest.fixture(scope="module")
def images(spark):
    return datagen.with_footprint(
        datagen.images_df(spark, N, with_pixels=True, size_cap=64)
    ).cache()


@pytest.fixture(scope="module")
def base_tiles(images):
    return P.composite_tiles(P.base_patches(images, TZ)).cache()


def _covering_tiles(i):
    fp = datagen.footprint_np(np.array([i]))
    mx0, my0 = lonlat_to_meters_np(fp["lon_min"][0], fp["lat_min"][0])
    mx1, my1 = lonlat_to_meters_np(fp["lon_max"][0], fp["lat_max"][0])
    tx0, ty0 = M.meters_to_tile_py(float(mx0), float(my0), TZ)
    tx1, ty1 = M.meters_to_tile_py(float(mx1), float(my1), TZ)
    return {(tx, ty) for tx in range(tx0, tx1 + 1) for ty in range(ty0, ty1 + 1)}


class TestBaseTiles:
    def test_assignment_matches_mercator_oracle(self, base_tiles):
        got = set()
        lineage = {}
        for r in base_tiles.collect():
            got.add((r.tx, r.ty))
            for s in r.src_ids:
                lineage.setdefault(s, set()).add((r.tx, r.ty))
        want = set()
        for i in range(N):
            tiles_i = _covering_tiles(i)
            want |= tiles_i
            # per-image lineage can only be covering tiles (alpha may trim)
            assert lineage[f"img{i:08d}"] <= tiles_i
        assert got <= want
        # every image contributed at least one tile
        assert set(lineage) == {f"img{i:08d}" for i in range(N)}

    def test_xyz_flip_and_schema(self, base_tiles):
        for r in base_tiles.collect():
            assert r.ty_xyz == (1 << TZ) - 1 - r.ty
            assert r.tz == TZ and r.n_src == len(r.src_ids) and r.ms >= 0

    def test_content_vs_direct_warp(self, base_tiles):
        """Pick one (tile, single-source) pair, re-derive pixels by hand."""
        rows = [r for r in base_tiles.collect() if r.n_src == 1]
        assert rows
        checked = 0
        for r in rows[:5]:
            i = int(r.src_ids[0][3:])
            w, h, fmt, _ = datagen.row_meta(i, size_cap=64)
            arr = codecs.decode_image(
                codecs.encode_image(datagen.make_pixels(i, h, w), fmt), fmt
            )
            fp = datagen.footprint_np(np.array([i]))
            src_gt = footprint_gt(fp["lon_min"][0], fp["lat_min"][0],
                                  fp["lon_max"][0], fp["lat_max"][0], w, h)
            bx0, by0, bx1, by1 = M.tile_bounds_meters_py(r.tx, r.ty, TZ)
            dst_gt = (bx0, (bx1 - bx0) / 256, 0.0, by1, 0.0, -(by1 - by0) / 256)
            want, mask = warp_array(arr, src_gt, dst_gt, 256, 256,
                                    resample="bilinear", return_mask=True)
            got = codecs.png_decode(bytes(r.png))
            assert np.array_equal(got[mask], want[mask])
            assert (got[~mask] == 0).all()
            checked += 1
        assert checked


class TestOverview:
    def test_cross_zoom_consistency(self, spark, images, base_tiles):
        """Overview(z-1 from z children) vs base tiles generated directly
        at z-1 — an INDEPENDENT check of the 2x2 paste orientation: a
        flipped paste scores near-zero PSNR."""
        ov = {(r.tx, r.ty): r for r in P.overview_zoom(base_tiles).collect()}
        direct = {
            (r.tx, r.ty): r
            for r in P.composite_tiles(P.base_patches(images, TZ - 1)).collect()
        }
        assert set(ov) == set(direct)
        scores = []
        for k in ov:
            a = codecs.png_decode(bytes(ov[k].png)).astype(float)
            b = codecs.png_decode(bytes(direct[k].png)).astype(float)
            nz = (a.sum(axis=2) > 0) | (b.sum(axis=2) > 0)
            assert nz.any()
            scores.append(quality.psnr(a[nz], b[nz]))
        assert np.median(scores) > 20.0, scores

    def test_overview_lineage_union(self, base_tiles):
        ov = P.overview_zoom(base_tiles).collect()
        children = base_tiles.collect()
        for r in ov:
            want = sorted(
                {s for c in children
                 if (c.tx >> 1, c.ty >> 1) == (r.tx, r.ty) for s in c.src_ids}
            )
            assert r.src_ids == want


class TestResumeAndPyramid:
    def test_resume_skips_done(self, spark, images, base_tiles):
        done = base_tiles.limit(3).select("tz", "tx", "ty").cache()
        done_set = {(r.tx, r.ty) for r in done.collect()}
        redone = P.composite_tiles(
            P.resume_filter(P.base_patches(images, TZ), done)
        )
        got = {(r.tx, r.ty) for r in redone.collect()}
        assert got.isdisjoint(done_set)
        assert got | done_set == {(r.tx, r.ty) for r in base_tiles.collect()}

    def test_build_pyramid_levels(self, spark, images):
        pyr = P.build_pyramid(images, tz_max=TZ, tz_min=TZ - 2)
        assert sorted(pyr) == [TZ - 2, TZ - 1, TZ]
        n_base = pyr[TZ].count()
        n_top = pyr[TZ - 2].count()
        assert 0 < n_top <= n_base

    def test_write_and_read_keys(self, spark, base_tiles, tmp_path):
        path = str(tmp_path / "tiles")
        P.write_tiles(base_tiles, path, mode="overwrite")
        keys = P.read_tile_keys(spark, path)
        assert keys.count() == base_tiles.count()

    def test_pyramid_resume_with_existing_store(self, spark, images, base_tiles):
        """Resume never recomputes stored tiles but still pastes them into
        parents: full-run pyramid == partial store + resumed new tiles."""
        full = P.build_pyramid(images, tz_max=TZ, tz_min=TZ - 1)
        full_keys = {
            tz: {(r.tx, r.ty) for r in df.collect()} for tz, df in full.items()
        }
        # pretend half the base tiles and no overview tiles are stored
        existing = base_tiles.limit(base_tiles.count() // 2).cache()
        stored = {(r.tx, r.ty) for r in existing.collect()}
        resumed = P.build_pyramid(images, tz_max=TZ, tz_min=TZ - 1, existing=existing)
        new_base = {(r.tx, r.ty) for r in resumed[TZ].collect()}
        assert new_base == full_keys[TZ] - stored
        assert {(r.tx, r.ty) for r in resumed[TZ - 1].collect()} == full_keys[TZ - 1]

    def test_max_zoom_selection(self, images):
        z = P.max_zoom_for(images)
        assert 5 <= z <= 16  # 64px over 0.01-0.5 deg footprints


# ---------------------------------------------------------------------------
# GlobalGeodetic profile (gdal2tiles.py:535-629)
# ---------------------------------------------------------------------------


def test_geodetic_tile_math_pinned():
    from gdal_spark.functions import mercator as M

    # tmscompatible: resFact=180/256; z=3 -> res=0.087890625
    assert M.lonlat_to_tile_geodetic_py(10.0, 45.0, 3) == (8, 5)
    # py = 135/res = 1536.0 exactly: ceil(1536/256)-1 = 5 (boundary rule)
    assert M.tile_bounds_geodetic_py(8, 5, 3) == (0.0, 22.5, 22.5, 45.0)
    # non-tms (1 tile at level 0): resFact=360/256
    assert M.lonlat_to_tile_geodetic_py(10.0, 45.0, 3, tms_compatible=False) == (4, 2)
    # whole world at z0 (tms): two tiles side by side
    assert M.lonlat_to_tile_geodetic_py(-179.9, -89.9, 0) == (0, 0)
    assert M.lonlat_to_tile_geodetic_py(179.9, 89.9, 0) == (1, 0)
    # ZoomForPixelSize never scales up
    assert M.geodetic_zoom_for_pixel_size_py(0.703125) == 0
    assert M.geodetic_zoom_for_pixel_size_py(0.08) == 3


def test_geodetic_column_matches_scalar(spark):
    from pyspark.sql import functions as F

    lons = np.linspace(-179.5, 179.5, 41)
    lats = np.linspace(-89.5, 89.5, 41)
    df = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in zip(lons, lats)], "lon double, lat double"
    )
    tx, ty = M.lonlat_to_tile_geodetic(F.col("lon"), F.col("lat"), 7)
    rows = df.select(tx.alias("tx"), ty.alias("ty")).collect()
    for (lo, la), r in zip(zip(lons, lats), rows):
        assert (r.tx, r.ty) == M.lonlat_to_tile_geodetic_py(float(lo), float(la), 7)


def test_geodetic_pyramid_cover_and_content(spark, images):
    """-p geodetic end-to-end: base-tile keys == the closed-form geodetic
    cover; overview zoom keys are the halved parents."""
    tz = 5
    tiles = P.composite_tiles(P.base_patches(images, tz, profile="geodetic"))
    got = {(r.tx, r.ty) for r in tiles.select("tx", "ty").collect()}
    fp = datagen.footprint_np(np.arange(N))
    want = set()
    for i in range(N):
        tx0, ty0 = M.lonlat_to_tile_geodetic_py(
            float(fp["lon_min"][i]), float(fp["lat_min"][i]), tz
        )
        tx1, ty1 = M.lonlat_to_tile_geodetic_py(
            float(fp["lon_max"][i]), float(fp["lat_max"][i]), tz
        )
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                want.add((tx, ty))
    # warp masks can only drop empty tiles, never add
    assert got <= want
    assert len(got) >= 0.8 * len(want)
    ov = P.overview_zoom(tiles)
    parents = {(r.tx, r.ty) for r in ov.select("tx", "ty").collect()}
    assert parents == {(tx // 2, ty // 2) for tx, ty in got}
