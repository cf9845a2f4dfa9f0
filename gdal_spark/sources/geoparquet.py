"""GeoParquet writer/reader with bbox covering and spatial pruning.

Re-expresses the reference's Arrow/Parquet vector driver
(ogr/ogrsf_frmts/parquet: ogrparquetwriterlayer.cpp writes the ``geo``
file-metadata JSON per the GeoParquet spec; GDAL 3.9+ emits the 1.1
``covering.bbox`` struct column) as a distributed Spark sink/scan:

  * `write_geoparquet` — every partition writes one parquet file via
    pyarrow with (a) a ``bbox`` struct column (xmin/ymin/xmax/ymax per
    row, the GeoParquet 1.1 covering), and (b) the ``geo`` key-value
    metadata carrying encoding=WKB, the file-level bbox, and the
    covering paths. Optional Hilbert spatial clustering first
    (`functions/hilbert.py`), so each file and each parquet row group
    covers a tight spatial window — that's what makes the statistics
    selective.
  * `read_geoparquet` — two-level pruning, the COG-for-vectors access
    pattern: (1) driver-side FILE pruning on each footer's ``geo`` bbox
    (metadata-only reads, no data IO), (2) Catalyst ROW-GROUP pruning by
    pushing ``bbox.xmin <= qxmax AND ...`` filters down to parquet
    min/max statistics. At the 100 TB corpus scale a z10-tile query
    reads only the files and row groups whose covering intersects the
    window; everything else is never fetched.

Intersects semantics on the envelope: query (qx0, qy0, qx1, qy1) keeps
rows with bbox.xmin <= qx1 AND bbox.xmax >= qx0 AND bbox.ymin <= qy1
AND bbox.ymax >= qy0 — the same envelope prefilter the spatial join
uses; exact geometry tests remain the caller's second phase.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEO_VERSION = "1.1.0"

_BBOX_FIELDS = ("xmin", "ymin", "xmax", "ymax")


def with_bbox(df: DataFrame, wkb_col: str = "wkb", out: str = "bbox") -> DataFrame:
    """Append the GeoParquet covering struct computed from WKB (Arrow
    batches through the engine's WKB envelope kernel)."""
    import pandas as pd

    sch = T.StructType([T.StructField(n, T.DoubleType()) for n in _BBOX_FIELDS])

    # no type hints: scalar pandas UDF with a struct returnType
    # (pyspark 4 can't infer Series -> DataFrame from annotations)
    def _bb_fn(col):
        from gdal_spark.functions import wkb as W

        vals = [W.bbox(bytes(b)) for b in col]
        return pd.DataFrame(vals, columns=list(_BBOX_FIELDS))

    _bb = F.pandas_udf(_bb_fn, sch)

    return df.withColumn(out, _bb(F.col(wkb_col)))


def _geo_meta(wkb_col: str, file_bbox: list[float]) -> bytes:
    return json.dumps(
        {
            "version": GEO_VERSION,
            "primary_column": wkb_col,
            "columns": {
                wkb_col: {
                    "encoding": "WKB",
                    "geometry_types": [],
                    "bbox": file_bbox,
                    "covering": {
                        "bbox": {n: ["bbox", n] for n in _BBOX_FIELDS}
                    },
                }
            },
        }
    ).encode()


def write_geoparquet(
    df: DataFrame,
    path: str,
    wkb_col: str = "wkb",
    spatial_sort: bool = True,
    num_files: int | None = None,
    row_group_rows: int = 4096,
) -> list[dict]:
    """Distributed GeoParquet sink: one file per partition, written by
    the task itself with pyarrow (same shape as the Arrow IPC sink).
    Returns the driver-side manifest [(file, rows, bbox)] — a gdaltindex
    of what was just written. ``spatial_sort`` range-partitions on the
    Hilbert code of bbox centers so files/row groups are spatially tight."""
    from gdal_spark.functions.hilbert import with_hilbert_code

    os.makedirs(path, exist_ok=True)
    bdf = with_bbox(df, wkb_col)
    if spatial_sort:
        cx = (F.col("bbox.xmin") + F.col("bbox.xmax")) / 2.0
        cy = (F.col("bbox.ymin") + F.col("bbox.ymax")) / 2.0
        # scale lon/lat to the 16-bit Hilbert domain
        bdf = bdf.withColumn("gx", ((cx + 180.0) / 360.0 * 65535).cast("long"))
        bdf = bdf.withColumn("gy", ((cy + 90.0) / 180.0 * 65535).cast("long"))
        bdf = with_hilbert_code(bdf, "gx", "gy", out="_hcode").drop("gx", "gy")
        if num_files:
            bdf = bdf.repartitionByRange(num_files, "_hcode")
        bdf = bdf.sortWithinPartitions("_hcode").drop("_hcode")
    elif num_files:
        bdf = bdf.repartition(num_files)

    man_sch = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("nrows", T.LongType()),
        ]
        + [T.StructField(n, T.DoubleType()) for n in _BBOX_FIELDS]
    )

    def writer(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdf = pd.concat(list(batches), ignore_index=True) if batches else None
        # (a re-listed empty iterator never reaches here with rows=0 files)
        if pdf is None or len(pdf) == 0:
            return iter(())
        fb = [
            float(pdf["bbox"].map(lambda b: b["xmin"]).min()),
            float(pdf["bbox"].map(lambda b: b["ymin"]).min()),
            float(pdf["bbox"].map(lambda b: b["xmax"]).max()),
            float(pdf["bbox"].map(lambda b: b["ymax"]).max()),
        ]
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        tbl = tbl.replace_schema_metadata(
            {**(tbl.schema.metadata or {}), b"geo": _geo_meta(wkb_col, fb)}
        )
        fname = os.path.join(path, f"part-{pid:05d}.parquet")
        pq.write_table(tbl, fname, row_group_size=row_group_rows)
        out = pd.DataFrame(
            [(fname, len(pdf), *fb)], columns=[f.name for f in man_sch.fields]
        )
        return iter((out,))

    def gen(batches):
        yield from writer(batches)

    return [r.asDict() for r in bdf.mapInPandas(gen, man_sch).collect()]


def geo_metadata(file: str) -> dict | None:
    """Footer-only read of one file's ``geo`` metadata (no data IO)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file).schema_arrow.metadata or {}
    raw = md.get(b"geo")
    return json.loads(raw) if raw else None


def read_geoparquet(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    wkb_col: str = "wkb",
) -> DataFrame:
    """Scan with two-level spatial pruning (see module docstring). With
    no ``bbox``, reads everything."""
    files = sorted(
        os.path.join(path, p) for p in os.listdir(path) if p.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files under {path}")
    all_files = list(files)
    if bbox is not None:
        qx0, qy0, qx1, qy1 = bbox
        kept = []
        for f in files:
            meta = geo_metadata(f)
            if meta is None:
                kept.append(f)
                continue
            fb = meta["columns"][meta["primary_column"]].get("bbox")
            if fb is None or (
                fb[0] <= qx1 and fb[2] >= qx0 and fb[1] <= qy1 and fb[3] >= qy0
            ):
                kept.append(f)
        files = kept
        if not files:  # window misses every file: empty frame, same schema
            return spark.read.parquet(all_files[0]).limit(0)
    df = spark.read.parquet(*files)
    if bbox is not None:
        qx0, qy0, qx1, qy1 = bbox
        df = df.filter(
            (F.col("bbox.xmin") <= qx1)
            & (F.col("bbox.xmax") >= qx0)
            & (F.col("bbox.ymin") <= qy1)
            & (F.col("bbox.ymax") >= qy0)
        )
    return df


def pruned_file_count(
    path: str, bbox: tuple[float, float, float, float]
) -> tuple[int, int]:
    """(kept, total) file counts for a window — pruning evidence."""
    files = [p for p in os.listdir(path) if p.endswith(".parquet")]
    qx0, qy0, qx1, qy1 = bbox
    kept = 0
    for p in files:
        meta = geo_metadata(os.path.join(path, p))
        fb = meta["columns"][meta["primary_column"]]["bbox"] if meta else None
        if fb is None or (
            fb[0] <= qx1 and fb[2] >= qx0 and fb[1] <= qy1 and fb[3] >= qy0
        ):
            kept += 1
    return kept, len(files)
