"""Incremental tile refresh: two streamed micro-batches must converge to
EXACTLY the tiles a single batch run over all images produces (painter
order is preserved because stored pixels form the base layer and new
image_ids sort after old ones)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

from gdal_spark import datagen
from gdal_spark.functions import codecs
from gdal_spark.streaming import refresh as R
from gdal_spark.tiles import pipeline as P

TZ = 8


def _subset(spark, lo, hi):
    return datagen.with_footprint(
        datagen.images_df(spark, hi, with_pixels=True, size_cap=64)
    ).filter(f"image_id >= 'img{lo:08d}'")


class TestIncrementalRefresh:
    def test_two_batches_equal_full_run(self, spark, tmp_path):
        store = str(tmp_path / "store")
        full = P.composite_tiles(
            P.base_patches(_subset(spark, 0, 10), TZ)
        ).collect()

        n1 = R.refresh_batch(_subset(spark, 0, 5), store, TZ, version=0)
        n2 = R.refresh_batch(
            _subset(spark, 5, 10).filter("image_id >= 'img00000005'"), store, TZ, version=1
        )
        assert n1 > 0 and n2 > 0

        latest = {(r.tx, r.ty): r for r in R.read_latest_tiles(spark, store).collect()}
        want = {(r.tx, r.ty): r for r in full}
        assert set(latest) == set(want)
        for k in want:
            a = codecs.png_decode(bytes(latest[k].png))
            b = codecs.png_decode(bytes(want[k].png))
            assert np.array_equal(a, b), k
            assert sorted(latest[k].src_ids) == sorted(want[k].src_ids)

    def test_streaming_source_end_to_end(self, spark, tmp_path):
        imdir = str(tmp_path / "in")
        store = str(tmp_path / "st")
        ckpt = str(tmp_path / "ck")
        os.makedirs(imdir)
        imgs = datagen.with_footprint(
            datagen.images_df(spark, 6, with_pixels=True, size_cap=64)
        )
        imgs.write.mode("append").parquet(imdir)
        q = R.start_refresh_stream(
            spark, imdir, store, ckpt, TZ, images_schema=imgs.schema
        )
        q.awaitTermination(120)
        latest = R.read_latest_tiles(spark, store)
        assert latest is not None and latest.count() > 0
        m = R.store_path_metrics(spark, store).collect()
        assert m and m[0].n_tiles == latest.count()
