"""Contract entry for the GTI tile index (sources/gti.py).

Reference: frmts/gti/gdaltileindexdataset.cpp — index-layer spatial
filter, open-only-intersecting-tiles, painter's composite in SORT_FIELD
order. Driver row is rows-only (the mosaic kernel is not
DuckDB-expressible); exactness vs a single-machine composite oracle is
pinned by tests/test_gti.py, and the scan-level pruning (PushedFilters on
the parquet index) is asserted there too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark import datagen
from gdal_spark.sources import gti


def gti_window_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed virtual-mosaic read over a 96-image corpus: index ->
    bbox-pruned candidates -> decode-once patch stage -> one shuffle on
    the dst block key -> painter's composite. Emits per-block lineage +
    coverage + checksum."""
    from gdal_spark.functions import checksum as CK  # noqa: F401 (worker import)

    imgs = datagen.with_footprint(
        datagen.images_df(spark, 96, with_pixels=True, size_cap=48)
    )
    # window over the corpus's hot cluster (every 5th footprint lands in
    # the 1-degree box at HOT_LON0/HOT_LAT0) -> a dense overlapping mosaic
    window = (
        datagen.HOT_LON0 - 0.3, datagen.HOT_LAT0 - 0.3,
        datagen.HOT_LON0 + 1.3, datagen.HOT_LAT0 + 1.3,
    )

    index = gti.build_index(imgs)
    blocks = gti.read_window(index, imgs, window, out_w=384, out_h=256, block=128)

    @F.pandas_udf(T.IntegerType())
    def cks(rgb):  # per-block checksum of the composited pixels
        import numpy as np

        from gdal_spark.functions import checksum as CKw

        return rgb.map(
            lambda b: int(CKw.checksum(np.frombuffer(bytes(b), np.uint8).astype(np.float64)[None, :]))
        ).astype("int32")

    return (
        blocks.select(
            "bx", "by", "n_src",
            F.round("valid_frac", 4).alias("valid_frac"),
            cks(F.col("rgb")).alias("cks"),
            F.array_join("src_ids", ",").alias("lineage"),
        )
        .orderBy("bx", "by")
    )


SPARK = {"gti_window_read": gti_window_read}
ORACLE: dict[str, str] = {}
