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


_MOD_SCH = T.StructType(
    [
        T.StructField("bx", T.IntegerType()),
        T.StructField("by", T.IntegerType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("vr", T.IntegerType()),
        T.StructField("vg", T.IntegerType()),
        T.StructField("vb", T.IntegerType()),
        T.StructField("n_sources", T.IntegerType()),
        T.StructField("coverage", T.DoubleType()),
    ]
)


def gti_mosaic_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form oracle twin of gti_window_read: a 2x2 mosaic of 16x16
    tiles (tile t at lon [tx*16,+16] x lat [ty*16,+16], 1 unit/pixel,
    channel values ((r*37 + c*101 + t*13) % 97) * {1,2,3} % 97) read
    through the REAL index -> candidates -> decode-once warp patches ->
    painter's composite pipeline at 1:1 scale, then exploded to pixels.
    Every output value, the per-block source count and the coverage are
    integer arithmetic of (gx, gy) that DuckDB recomputes."""
    import numpy as np
    import pandas as pd

    from gdal_spark.functions.tiff import tiff_encode

    rows = []
    for t in range(4):
        tx, ty = t % 2, t // 2
        r, c = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        v = (r * 37 + c * 101 + t * 13) % 97
        img = np.dstack([v, (v * 2) % 97, (v * 3) % 97]).astype(np.uint8)
        rows.append(
            (
                f"t{t}", bytearray(tiff_encode(img)), 16, 16, "tiff",
                float(tx * 16), float(ty * 16),
                float(tx * 16 + 16), float(ty * 16 + 16),
            )
        )
    images = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "lon_min double, lat_min double, lon_max double, lat_max double",
    )
    index = gti.build_index(images)
    blocks = gti.read_window(
        index, images, (0.0, 0.0, 32.0, 32.0), 32, 32, block=16,
        resample="near",
    )

    def explode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                rgb = np.frombuffer(bytes(r.rgb), np.uint8).reshape(16, 16, 3)
                for i in range(16):
                    for j in range(16):
                        out.append(
                            (int(r.bx), int(r.by), i, j,
                             int(rgb[i, j, 0]), int(rgb[i, j, 1]),
                             int(rgb[i, j, 2]),
                             int(r.n_src), float(r.valid_frac))
                        )
            yield pd.DataFrame(out, columns=[f.name for f in _MOD_SCH.fields])

    return blocks.mapInPandas(explode, _MOD_SCH)


_GTI_MOD_ORACLE = """
    WITH g AS (
        SELECT gy.range AS gy, gx.range AS gx
        FROM range(32) gy CROSS JOIN range(32) gx
    ), v AS (
        SELECT gy // 16 AS by, gx // 16 AS bx,
               gy % 16 AS i, gx % 16 AS j,
               ((gy % 16) * 37 + (gx % 16) * 101
                + ((1 - gy // 16) * 2 + gx // 16) * 13) % 97 AS v0
        FROM g
    )
    SELECT CAST(bx AS INT) AS bx, CAST(by AS INT) AS by,
           CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(v0 AS INT) AS vr,
           CAST((v0 * 2) % 97 AS INT) AS vg,
           CAST((v0 * 3) % 97 AS INT) AS vb,
           CAST(1 AS INT) AS n_sources, 1.0 AS coverage
    FROM v
"""

SPARK["gti_mosaic_mod"] = gti_mosaic_mod
ORACLE["gti_mosaic_mod"] = _GTI_MOD_ORACLE
