"""Unsupported-codec quarantine contract query.

Every executor task builds a mixed corpus slice — decodable images
(png/tiff/jpeg/webp-lossy/webp-alpha of closed-form pixels),
real HEIC/AVIF (decoded through the system libheif/libavif exactly as
the reference's frmts/heif + frmts/avif do), well-formed but
env-undecodable containers (animated webp, JPEG-XL, JP2 signature
boxes), truncated/garbage bytes, and mislabeled rows — then routes it
through functions/codecs.classify_table.  The driver's hash compare
pins the per-(fmt, decode_status) counts, so a 100 TB corpus run
degrades measurably (quarantine column) instead of erroring when it
meets codecs this environment cannot decode (frmts/jpegxl,
frmts/openjpeg remain external-only).  Lossy VP8 and ALPH decode
natively (functions/vp8.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_SIDE = 16


def _fixture_rows(k: int) -> list[tuple[str, bytes]]:
    from gdal_spark.functions import codecs as C

    from gdal_spark.functions.heif_fixtures import (AVIF_FIXTURE,
                                                    HEIC_FIXTURE)
    from gdal_spark.functions.webp_fixtures import (ALPHA_WEBP, ANIM_WEBP,
                                                    LOSSY_WEBP)

    r, c = np.meshgrid(np.arange(_SIDE), np.arange(_SIDE), indexing="ij")
    arr = ((r * 3 + c * 5 + k) % 251).astype(np.uint8)
    heif = (32).to_bytes(4, "big") + b"ftypheic" + bytes(24)
    jxl = b"\x00\x00\x00\x0cJXL \x0d\x0a\x87\x0a" + bytes(16)
    jp2 = b"\x00\x00\x00\x0cjP  \x0d\x0a\x87\x0a" + bytes(16)
    png = C.encode_image(arr, "png")
    return [
        ("png", png),                          # ok
        ("tiff", C.encode_image(arr, "tiff")),  # ok
        ("jpeg", C.encode_image(arr, "jpeg")),  # ok
        ("webp", LOSSY_WEBP),                  # ok (lossy VP8, RFC 6386)
        ("webp", ALPHA_WEBP),                  # ok (VP8 + ALPH -> RGBA)
        ("heif", HEIC_FIXTURE),                # ok (libheif delegation)
        ("avif", AVIF_FIXTURE),                # ok (libavif delegation)
        ("webp", ANIM_WEBP),                   # unsupported_codec (ANIM)
        ("jxl", jxl),                          # unsupported_codec
        ("jp2", jp2),                          # unsupported_codec
        ("png", png[: len(png) // 3]),         # corrupt (truncated)
        ("webp", b"\x00\x01\x02garbage" + bytes(32)),  # corrupt (bad magic)
        ("heif", heif),                        # corrupt (magic, junk body)
        ("mystery", ANIM_WEBP),                # unsupported (sniffed magic)
        ("mystery", b"\xde\xad\xbe\xef" + bytes(32)),  # corrupt (unknown)
    ]


def decode_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.functions import codecs as C

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                rows.extend((int(k), f, b) for f, b in _fixture_rows(int(k)))
            yield pd.DataFrame(rows, columns=["k", "fmt", "bytes"])

    corpus = (
        load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(gen, sch)
    )
    return (
        C.classify_table(corpus)
        .groupBy("fmt", "decode_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# nation has 25 rows at every sf the driver uses; each contributes one
# fixture row per category
_QUARANTINE_ORACLE = """
    WITH cats(fmt, decode_status, mult) AS (
        VALUES ('png', 'ok', 1), ('tiff', 'ok', 1), ('jpeg', 'ok', 1),
               ('webp', 'ok', 2),            -- lossy VP8 + VP8X/ALPH RGBA
               ('heif', 'ok', 1),            -- libheif delegation
               ('avif', 'ok', 1),            -- libavif delegation
               ('webp', 'unsupported_codec', 1),  -- animation
               ('jxl', 'unsupported_codec', 1),
               ('jp2', 'unsupported_codec', 1),
               ('png', 'corrupt', 1), ('webp', 'corrupt', 1),
               ('heif', 'corrupt', 1),       -- magic ok, junk body
               ('mystery', 'unsupported_codec', 1), ('mystery', 'corrupt', 1)
    )
    SELECT fmt, decode_status,
           mult * (SELECT COUNT(*) FROM nation) AS n
    FROM cats
"""


SPARK = {"decode_status_counts": decode_status_counts}
ORACLE = {"decode_status_counts": _QUARANTINE_ORACLE}
