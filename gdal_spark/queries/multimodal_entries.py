"""Oracle-backed multimodal (audio/video) contract entries.

Both run the REAL codec round trip (RIFF/WAVE PCM16; multi-page TIFF
chained IFDs) inside Arrow batches, and both are integer-exact so
DuckDB recomputes every value from the generating formula:

* audio_features_mod — per nation k, a deterministic PCM16 waveform
  s_i = ((i*13 + k*7) % 97 - 48) * 256 is WAV-encoded, decoded back,
  and reduced to per-frame (n, sum-of-squares, zero-crossing count).
* video_frame_sample_mod — per nation k, 8 mod-raster frames are
  packed into one multi-page TIFF; every 3rd frame is sampled (only
  those IFDs are decoded) and reduced to its pixel sum.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.queries.closedform_raster import _N, _mod_raster, _nation

_NSAMP = 256
_FRAME = 64
_NFRAMES = 8
_EVERY = 3


def _wave(k: int) -> np.ndarray:
    i = np.arange(_NSAMP, dtype=np.int64)
    return (((i * 13 + k * 7) % 97 - 48) * 256).astype(np.int16)


def audio_features_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.multimodal import audio_features, wav_decode, wav_encode

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("frame", T.IntegerType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("sumsq", T.LongType()),
            T.StructField("zcr", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                blob = wav_encode(_wave(k), rate=16000)
                samples, rate = wav_decode(blob)
                assert rate == 16000
                for f, n, ss, zc in audio_features(samples, _FRAME):
                    rows.append((k, f, n, ss, zc))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_AUDIO_ORACLE = f"""
    WITH s AS (
        SELECT n_nationkey AS k, i.range AS i,
               ((i.range * 13 + n_nationkey * 7) % 97 - 48) * 256 AS v
        FROM nation CROSS JOIN range({_NSAMP}) i
    ),
    p AS (
        SELECT k, i // {_FRAME} AS frame, v,
               lead(v) OVER (PARTITION BY k ORDER BY i) AS nv,
               (i % {_FRAME}) = {_FRAME - 1} AS last_in_frame
        FROM s
    )
    SELECT k, CAST(frame AS INT) AS frame,
           CAST(count(*) AS INT) AS n,
           CAST(sum(v * v) AS BIGINT) AS sumsq,
           CAST(sum(CASE WHEN NOT last_in_frame AND v * nv < 0
                         THEN 1 ELSE 0 END) AS INT) AS zcr
    FROM p GROUP BY k, frame
"""


def video_frame_sample_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.multimodal import frame_sample, tiff_encode_seq

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("frame", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("px_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                blob = tiff_encode_seq(
                    [_mod_raster(k + f, _N) for f in range(_NFRAMES)]
                )
                for i, arr in frame_sample(blob, every=_EVERY):
                    rows.append(
                        (
                            k, i, arr.shape[0], arr.shape[1],
                            int(arr.astype(np.int64).sum()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_VIDEO_ORACLE = f"""
    WITH f AS (
        SELECT n_nationkey AS k, fr.range AS frame
        FROM nation CROSS JOIN range(0, {_NFRAMES}, {_EVERY}) fr
    ),
    px AS (
        SELECT k, frame,
               (y.range * 37 + x.range * 101 + (k + frame) * 13) % 97 AS v
        FROM f CROSS JOIN range({_N}) y CROSS JOIN range({_N}) x
    )
    SELECT k, CAST(frame AS INT) AS frame,
           CAST({_N} AS INT) AS h, CAST({_N} AS INT) AS w,
           CAST(sum(v) AS BIGINT) AS px_sum
    FROM px GROUP BY k, frame
"""


SPARK = {
    "audio_features_mod": audio_features_mod,
    "video_frame_sample_mod": video_frame_sample_mod,
}

ORACLE = {
    "audio_features_mod": _AUDIO_ORACLE,
    "video_frame_sample_mod": _VIDEO_ORACLE,
}
