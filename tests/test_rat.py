"""RAT (gcore/gdal_rat.cpp) — GetRowOfValue binning + broadcast-join
semantics, plus the pixel-histogram entry's exactness vs direct numpy."""

from __future__ import annotations

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from gdal_spark.raster import rat  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from gdal_spark.session import get_session

    return get_session(master="local[4]", shuffle_partitions=4)


class TestRowOfValue:
    def test_linear_binning(self, spark):
        df = spark.createDataFrame(
            [(0, -0.5), (1, 0.0), (2, 2.49), (3, 2.5), (4, 19.99), (5, 20.0)],
            "id int, v double",
        )
        out = {
            r.id: r.row
            for r in df.select(
                "id", rat.row_of_value_linear(F.col("v"), 0.0, 2.5, 8).alias("row")
            ).collect()
        }
        # floor((v-row0)/bin); -1 outside [0, n_rows)
        assert out == {0: -1, 1: 0, 2: 0, 3: 1, 4: 7, 5: -1}

    def test_attach_linear_left_join_nulls(self, spark):
        data = spark.createDataFrame([(1, 25.0), (2, 1.0)], "id int, v double")
        tbl = spark.createDataFrame([(0, "a")], "rat_row int, name string")
        got = {
            r.id: r.name
            for r in rat.attach_linear(data, "v", tbl, 0.0, 2.5, 1).collect()
        }
        assert got == {1: None, 2: "a"}

    def test_attach_ranges(self, spark):
        data = spark.createDataFrame([(1, 2.0), (2, 3.0), (3, 99.0)], "id int, v double")
        tbl = spark.createDataFrame(
            [("lo", 0.0, 3.0), ("hi", 3.0, 10.0)], "name string, vmin double, vmax double"
        )
        got = {r.id: r.name for r in rat.attach_ranges(data, "v", tbl).collect()}
        assert got == {1: "lo", 2: "hi", 3: None}


class TestBandHistogram:
    def test_matches_numpy(self, spark):
        from gdal_spark import datagen
        from gdal_spark.functions import codecs
        from gdal_spark.raster.ops import _luma

        imgs = datagen.images_df(spark, 6, with_pixels=True, size_cap=32)
        got = {
            (r.image_id, r.rat_row): r.pixel_count
            for r in rat.band_histogram_rat(imgs, 0.0, 16.0, 16).collect()
        }
        total = 0
        for r in imgs.collect():
            lum = _luma(codecs.decode_image(bytes(r.bytes), r.fmt))
            bins = np.floor(lum / 16.0).astype(np.int64)
            bins = np.where((bins < 0) | (bins >= 16), -1, bins)
            idx, cnt = np.unique(bins, return_counts=True)
            for i, c in zip(idx, cnt):
                assert got[(r.image_id, int(i))] == int(c)
                total += 1
        assert total == len(got)

    def test_plan_has_broadcast(self, spark):
        # the RAT side must broadcast — a shuffle join on a KB-side dim
        # would be the wrong 100-TB plan
        data = spark.createDataFrame([(1, 2.0)], "id int, v double")
        tbl = spark.createDataFrame([(0, "a")], "rat_row int, name string")
        plan = rat.attach_linear(data, "v", tbl, 0.0, 2.5, 1)._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
