"""SOZip parallel-scan contract query.

Builds a SOZip archive (sources/sozip.py — the engine analog of the
reference's ``gdal vsi sozip`` verb, apps/gdalalg_vsi_sozip.cpp +
port/cpl_vsil_gzip.cpp:3682) of a closed-form pipe-delimited text
member, then range-reads it back CHUNK-PARALLEL in executor tasks
(each task seeks to its chunk's compressed offset from the hidden
.sozip.idx index, inflates independently, and stitches lines across
chunk boundaries TextInputFormat-style) and aggregates the parsed
fields.  DuckDB recomputes the aggregates from the closed form, so a
regression anywhere in the writer, the index, the range reader, or the
line-ownership protocol fails the driver's hash compare.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_N_LINES = 20000
_CHUNK = 8192


def _archive_path() -> str:
    """Deterministic fixture archive (rebuilt on every call — the
    content is a pure function of the constants)."""
    from gdal_spark.sources import sozip as S

    path = os.path.join(tempfile.gettempdir(), "gdal_spark_sozip_scan.zip")
    lines = [
        f"{k}|{(k * 7) % 101}|" + "x" * (k % 53) for k in range(_N_LINES)
    ]
    data = ("\n".join(lines) + "\n").encode()
    tmp = path + ".tmp"
    S.sozip_create(tmp, [("rows.txt", data)], chunk_size=_CHUNK, enabled="YES")
    os.replace(tmp, path)
    return path


def sozip_parallel_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources import sozip as S

    path = _archive_path()
    info = S.sozip_member_info(path, "rows.txt")
    assert info["sozip_valid"] and info["nchunks"] > 50, info
    lines = S.sozip_lines_df(spark, path, "rows.txt")
    parts = F.split(F.col("line"), r"\|")
    return (
        lines.select(
            parts.getItem(0).cast("long").alias("k"),
            parts.getItem(1).cast("long").alias("v"),
            F.length(parts.getItem(2)).alias("xlen"),
        )
        .groupBy((F.col("k") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("v").alias("sum_v"),
            F.sum("xlen").alias("sum_xlen"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_SOZIP_ORACLE = f"""
    SELECT CAST(range % 10 AS BIGINT) AS bucket,
           COUNT(*) AS n_lines,
           CAST(SUM((range * 7) % 101) AS BIGINT) AS sum_v,
           CAST(SUM(range % 53) AS BIGINT) AS sum_xlen,
           CAST(MIN(range) AS BIGINT) AS min_k,
           CAST(MAX(range) AS BIGINT) AS max_k
    FROM range({_N_LINES})
    GROUP BY 1
"""


SPARK = {"sozip_parallel_scan": sozip_parallel_scan}
ORACLE = {"sozip_parallel_scan": _SOZIP_ORACLE}
