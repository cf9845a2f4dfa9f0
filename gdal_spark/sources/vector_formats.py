"""OGR vector format drivers: GeoJSON(Seq), CSV/WKT, Shapefile, GeoPackage.

The reference's OGR layer (ogr/ogrsf_frmts/) exists to move features
between ~80 container formats; the four implemented here carry the
overwhelming majority of real traffic (shape/, geojson/, csv/, gpkg/).
Feature model matches the engine's geometry convention: a DataFrame with
``fid`` (long), ``wkb`` (binary, little-endian ISO WKB) and one column
per attribute — exactly OGR's Arrow stream layout
(ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp).

Scale design (100 TB): formats split into
 * **splittable** — GeoJSONSeq (one feature per line) and CSV ride
   Spark's native text/csv readers: fully distributed scan, predicate
   pushdown on attribute columns, and distributed writes (a directory of
   part files, the standard big-data layout).
 * **single-file binary** — Shapefile and GeoPackage are record-indexed:
   the driver reads only the tiny index (.shx = 8 bytes/record; GPKG =
   min/max rowid), slices it into record RANGES, and each executor task
   opens the file itself and reads only its byte range (mapInPandas over
   a ranges DataFrame). Reading N records is O(N/tasks) per task with no
   driver bottleneck; this is how the reference's own Arrow fast path
   batches (shape/shape2ogr.cpp, gpkg/ogrgeopackagelayer.cpp). Writes to
   these formats are inherently single-writer (one header, sequential
   record offsets): the writer streams ``toLocalIterator()`` so driver
   memory stays O(batch), and big outputs belong in the splittable
   formats or parquet.
"""

from __future__ import annotations

import json
import os
import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import wkb as W
from gdal_spark.functions import wkt as WT

# --------------------------------------------------------------------------
# GeoJSON geometry <-> WKB
# --------------------------------------------------------------------------


def geojson_to_wkb(geom: dict | None) -> bytes | None:
    if geom is None:
        return None
    t, c = geom["type"], geom["coordinates"]
    if t == "Point":
        return W.write_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return W.write_linestring(np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        return W.write_polygon([np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return W.write_multipolygon(
            [[np.asarray(r, dtype=np.float64) for r in p] for p in c]
        )
    raise ValueError(f"unsupported GeoJSON geometry {t}")


def wkb_to_geojson(buf: bytes | None) -> dict | None:
    if buf is None:
        return None
    gtype, payload = W.parse(bytes(buf))
    if gtype == W.WKB_POINT:
        return {"type": "Point", "coordinates": list(payload)}
    if gtype == W.WKB_LINESTRING:
        return {"type": "LineString", "coordinates": payload.tolist()}
    if gtype == W.WKB_POLYGON:
        return {"type": "Polygon", "coordinates": [r.tolist() for r in payload]}
    if gtype == W.WKB_MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in p] for p in payload],
        }
    raise ValueError(f"unsupported WKB type {gtype}")


def _infer_props_schema(props: dict) -> T.StructType:
    fields = []
    for k, v in props.items():
        if isinstance(v, bool):
            t = T.BooleanType()
        elif isinstance(v, int):
            t = T.LongType()
        elif isinstance(v, float):
            t = T.DoubleType()
        else:
            t = T.StringType()
        fields.append(T.StructField(k, t))
    return T.StructType(fields)


def _feature_schema(props_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [T.StructField("fid", T.LongType()), T.StructField("wkb", T.BinaryType())]
        + list(props_schema.fields)
    )


# --------------------------------------------------------------------------
# GeoJSONSeq (RFC 8142 / one-feature-per-line) — the splittable scale path
# --------------------------------------------------------------------------


def read_geojson_seq(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Newline-delimited GeoJSON features -> (fid, wkb, *props).

    Property schema is sampled from the first feature unless given
    (GDAL's GeoJSON driver scans ahead the same way to type fields,
    ogrgeojsonreader.cpp). fid = the feature's 'id' member if numeric,
    else its position within its text batch (NOT globally unique —
    features needing stable ids should carry an 'id' member, which is
    what write_geojson_seq emits)."""
    if schema is None:
        first = None
        # sample driver-side: first line of the lexically-first part file
        paths = [path]
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, p)
                for p in os.listdir(path)
                if not p.startswith(("_", "."))
            )
        for p in paths:
            with open(p, "r", encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip().lstrip("\x1e")  # RS char of RFC 8142
                    if line:
                        first = json.loads(line)
                        break
            if first is not None:
                break
        if first is None:
            raise ValueError(f"no features in {path}")
        schema = _infer_props_schema(first.get("properties") or {})
    out_schema = _feature_schema(schema)
    names = [f.name for f in schema.fields]
    lines = spark.read.text(path)

    def parse(batches):
        for pdf in batches:
            rows = {n: [] for n in ["fid", "wkb"] + names}
            pos = 0
            for line in pdf["value"]:
                line = line.strip().lstrip("\x1e")
                if not line:
                    continue
                f = json.loads(line)
                props = f.get("properties") or {}
                fid = f.get("id")
                rows["fid"].append(int(fid) if isinstance(fid, (int, float)) else pos)
                rows["wkb"].append(geojson_to_wkb(f.get("geometry")))
                for n in names:
                    rows[n].append(props.get(n))
                pos += 1
            yield pd.DataFrame(rows)

    return lines.mapInPandas(parse, schema=out_schema)


def write_geojson_seq(df: DataFrame, path: str, wkb_col: str = "wkb") -> None:
    """Distributed GeoJSONSeq sink: each partition writes its own part
    file of newline-delimited Feature objects (df.write.text underneath,
    so the output commits atomically via the Hadoop committer)."""
    cols = [c for c in df.columns if c not in (wkb_col, "fid")]
    has_fid = "fid" in df.columns
    out_schema = T.StructType([T.StructField("value", T.StringType())])

    def render(batches):
        for pdf in batches:
            vals = []
            for _, r in pdf.iterrows():
                props = {}
                for c in cols:
                    v = r[c]
                    if isinstance(v, (np.integer,)):
                        v = int(v)
                    elif isinstance(v, (np.floating,)):
                        v = float(v)
                    elif v is not None and not isinstance(
                        v, (str, int, float, bool)
                    ):
                        v = str(v)
                    props[c] = v
                feat = {
                    "type": "Feature",
                    "geometry": wkb_to_geojson(r[wkb_col]),
                    "properties": props,
                }
                if has_fid:
                    feat["id"] = int(r["fid"])
                vals.append(json.dumps(feat, separators=(",", ":")))
            yield pd.DataFrame({"value": vals})

    df.mapInPandas(render, schema=out_schema).write.mode("overwrite").text(path)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Whole-document FeatureCollection (the non-splittable classic form):
    parsed driver-side — correct for config-sized files; the scale path
    is read_geojson_seq."""
    with open(path, "r", encoding="utf-8") as fh:
        doc = json.load(fh)
    feats = doc["features"]
    schema = _infer_props_schema((feats[0].get("properties") or {}) if feats else {})
    names = [f.name for f in schema.fields]
    rows = []
    for i, f in enumerate(feats):
        props = f.get("properties") or {}
        fid = f.get("id")
        rows.append(
            tuple(
                [int(fid) if isinstance(fid, (int, float)) else i]
                + [geojson_to_wkb(f.get("geometry"))]
                + [props.get(n) for n in names]
            )
        )
    return spark.createDataFrame(rows, _feature_schema(schema))


def write_geojson(df: DataFrame, path: str, wkb_col: str = "wkb") -> None:
    """Single FeatureCollection document; streams toLocalIterator so the
    driver holds one row at a time (single-writer format)."""
    cols = [c for c in df.columns if c not in (wkb_col, "fid")]
    with open(path, "w", encoding="utf-8") as fh:
        fh.write('{"type":"FeatureCollection","features":[\n')
        sep = ""
        for r in df.toLocalIterator():
            d = r.asDict()
            feat = {
                "type": "Feature",
                "geometry": wkb_to_geojson(d.get(wkb_col)),
                "properties": {c: d[c] for c in cols},
            }
            if "fid" in d:
                feat["id"] = int(d["fid"])
            fh.write(sep + json.dumps(feat, separators=(",", ":")))
            sep = ",\n"
        fh.write("\n]}\n")


# --------------------------------------------------------------------------
# CSV with WKT geometry (OGR CSV driver, GEOMETRY=AS_WKT + .csvt types)
# --------------------------------------------------------------------------

_CSVT_TYPES = {
    T.LongType(): "Integer64",
    T.IntegerType(): "Integer",
    T.DoubleType(): "Real",
    T.FloatType(): "Real",
    T.StringType(): "String",
    T.BooleanType(): "Integer",
}
_CSVT_BACK = {
    "Integer64": T.LongType(),
    "Integer": T.IntegerType(),
    "Real": T.DoubleType(),
    "String": T.StringType(),
    "WKT": T.StringType(),
    "Date": T.StringType(),
    "DateTime": T.StringType(),
}


def read_csv_wkt(
    spark: SparkSession, path: str, wkt_col: str = "WKT"
) -> DataFrame:
    """CSV with a WKT geometry column -> (*, wkb). Fully distributed:
    Spark's csv scan + an Arrow-batched WKT parse. Types come from the
    GDAL .csvt sidecar when present (ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp
    autodetects the same file), else Spark schema inference."""
    csvt = None
    probe = path
    if os.path.isdir(path):
        parts = sorted(
            p for p in os.listdir(path) if p.endswith(".csv") and not p.startswith("_")
        )
        probe = os.path.join(path, parts[0]) if parts else path
        sidecar = os.path.join(path, "_schema.csvt")
    else:
        sidecar = os.path.splitext(probe)[0] + ".csvt"
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            csvt = [t.strip().strip('"') for t in fh.read().strip().split(",")]
    if csvt:
        with open(probe) as fh:
            header = fh.readline().strip().split(",")
        schema = T.StructType(
            [
                T.StructField(h.strip('"'), _CSVT_BACK.get(t.split("(")[0], T.StringType()))
                for h, t in zip(header, csvt)
            ]
        )
        df = spark.read.csv(path, header=True, schema=schema)
    else:
        df = spark.read.csv(path, header=True, inferSchema=True)

    @F.pandas_udf(T.BinaryType())
    def parse_wkt(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else WT.from_wkt(v))

    return df.withColumn("wkb", parse_wkt(F.col(wkt_col))).drop(wkt_col)


def write_csv_wkt(df: DataFrame, path: str, wkb_col: str = "wkb") -> None:
    """Distributed CSV sink with AS_WKT geometry + a .csvt type sidecar
    next to the part files (written once, driver-side)."""

    @F.pandas_udf(T.StringType())
    def to_wkt_udf(b: pd.Series) -> pd.Series:
        return b.map(lambda v: None if v is None else WT.to_wkt(bytes(v)))

    out = df.withColumn("WKT", to_wkt_udf(F.col(wkb_col))).drop(wkb_col)
    cols = ["WKT"] + [c for c in out.columns if c != "WKT"]
    out = out.select(*cols)
    out.write.mode("overwrite").option("header", True).csv(path)
    types = ["WKT"] + [
        _CSVT_TYPES.get(f.dataType, "String") for f in out.schema.fields[1:]
    ]
    with open(os.path.join(path, "_schema.csvt"), "w") as fh:
        fh.write(",".join(types) + "\n")


# --------------------------------------------------------------------------
# ESRI Shapefile (.shp/.shx/.dbf) — record-range partitioned read
# --------------------------------------------------------------------------

SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    x, y = pt
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cond = (y0 <= y) != (y1 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
    return bool(np.sum(cond & (x < xi)) % 2)


def _shp_rings_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Shapefile polygon parts -> WKB: outer rings are CW (negative
    shoelace area, shape/shpopen.c convention); holes CCW, assigned to
    the outer that contains their first vertex."""
    outers = [r for r in rings if _ring_signed_area(r) < 0]
    holes = [r for r in rings if _ring_signed_area(r) >= 0]
    if not outers:  # degenerate: treat everything as one polygon
        return W.write_polygon(rings)
    polys = [[o] for o in outers]
    for h in holes:
        for p in polys:
            if _point_in_ring(h[0], p[0]):
                p.append(h)
                break
        else:
            polys[0].append(h)
    if len(polys) == 1:
        return W.write_polygon(polys[0])
    return W.write_multipolygon(polys)


def _parse_shp_record(content: bytes) -> bytes | None:
    (stype,) = struct.unpack_from("<i", content, 0)
    if stype == 0:  # null shape
        return None
    if stype == SHP_POINT:
        x, y = struct.unpack_from("<dd", content, 4)
        return W.write_point(x, y)
    if stype in (SHP_POLYLINE, SHP_POLYGON):
        nparts, npoints = struct.unpack_from("<ii", content, 36)
        parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(
            content, dtype="<f8", count=npoints * 2, offset=44 + 4 * nparts
        ).reshape(npoints, 2)
        bounds = list(parts) + [npoints]
        rings = [
            np.asarray(pts[bounds[i] : bounds[i + 1]], dtype=np.float64)
            for i in range(nparts)
        ]
        if stype == SHP_POLYLINE:
            return W.write_linestring(rings[0]) if nparts == 1 else W.write_linestring(
                np.vstack(rings)
            )
        return _shp_rings_to_wkb(rings)
    raise ValueError(f"unsupported shape type {stype}")


def _read_dbf_header(path: str):
    with open(path, "rb") as fh:
        head = fh.read(32)
        nrec, hdr_len, rec_len = struct.unpack_from("<IHH", head, 4)
        fields = []
        while True:
            fd = fh.read(32)
            if fd[0:1] == b"\r" or len(fd) < 32:
                break
            name = fd[0:11].split(b"\x00")[0].decode("ascii")
            ftype = chr(fd[11])
            flen = fd[16]
            fdec = fd[17]
            fields.append((name, ftype, flen, fdec))
    return nrec, hdr_len, rec_len, fields


def _dbf_value(raw: bytes, ftype: str, fdec: int):
    s = raw.decode("ascii", "replace").strip()
    if not s or s == "*" * len(s):
        return None
    if ftype in ("N", "F"):
        return float(s) if (fdec > 0 or "." in s) else int(s)
    if ftype == "L":
        return s in ("Y", "y", "T", "t")
    return s


def read_shapefile(
    spark: SparkSession, shp_path: str, num_partitions: int | None = None
) -> DataFrame:
    """Shapefile -> (fid, wkb, *dbf attributes), record-range partitioned.

    The driver touches only the .shx index (8 bytes/record) to compute
    byte ranges; each Spark task then reads its own slice of .shp and the
    matching fixed-width .dbf rows (dBase III). At 10^8+ records the .shx
    itself would be range-read per task from its record arithmetic —
    offsets here come straight off the index to also support sparse/
    compacted files, like shape/shpopen.c's SHXLoadAll."""
    base = os.path.splitext(shp_path)[0]
    shx, dbf = base + ".shx", base + ".dbf"
    with open(shx, "rb") as fh:
        idx = fh.read()
    n = (len(idx) - 100) // 8
    offsets = np.frombuffer(idx, dtype=">i4", count=2 * n, offset=100).reshape(n, 2)
    nrec, hdr_len, rec_len, fields = _read_dbf_header(dbf)
    assert nrec == n, f"shx/dbf record mismatch ({n} vs {nrec})"
    if num_partitions is None:
        num_partitions = min(max(1, n // 2048), spark.sparkContext.defaultParallelism)
    splits = np.array_split(np.arange(n), num_partitions)
    ranges = [(int(s[0]), int(s[-1]) + 1) for s in splits if len(s)]
    rng_df = spark.createDataFrame(ranges, "rec_lo: long, rec_hi: long")

    # OGR's FID is virtual: a real dBase attribute named "fid"/"wkb" must
    # not shadow the record columns, so those fall back to _-prefixed names
    names_lc = {f[0].lower() for f in fields}
    fid_col = "_fid" if "fid" in names_lc else "fid"
    wkb_col = "_wkb" if "wkb" in names_lc else "wkb"
    schema_fields = [
        T.StructField(fid_col, T.LongType()),
        T.StructField(wkb_col, T.BinaryType()),
    ]
    for name, ftype, flen, fdec in fields:
        if ftype in ("N", "F"):
            t = T.DoubleType() if (fdec > 0) else T.LongType()
        elif ftype == "L":
            t = T.BooleanType()
        else:
            t = T.StringType()
        schema_fields.append(T.StructField(name, t))
    out_schema = T.StructType(schema_fields)

    def read_ranges(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                lo, hi = int(rr["rec_lo"]), int(rr["rec_hi"])
                rows: dict = {f.name: [] for f in out_schema.fields}
                with open(shp_path, "rb") as fsh:
                    for rec in range(lo, hi):
                        off_words, len_words = offsets[rec]
                        fsh.seek(int(off_words) * 2 + 8)
                        content = fsh.read(int(len_words) * 2)
                        rows[fid_col].append(rec)
                        rows[wkb_col].append(_parse_shp_record(content))
                with open(dbf, "rb") as fdb:
                    fdb.seek(hdr_len + lo * rec_len)
                    blob = fdb.read((hi - lo) * rec_len)
                    for rec in range(hi - lo):
                        r = blob[rec * rec_len : (rec + 1) * rec_len]
                        pos = 1  # deletion flag byte
                        for name, ftype, flen, fdec in fields:
                            rows[name].append(_dbf_value(r[pos : pos + flen], ftype, fdec))
                            pos += flen
                yield pd.DataFrame(rows)

    return rng_df.mapInPandas(read_ranges, schema=out_schema)


def read_dbf(
    spark: SparkSession, dbf_path: str, num_partitions: int | None = None
) -> DataFrame:
    """Standalone dBase table -> (fid, *attributes) — OGR's ESRI Shapefile
    driver opens bare .dbf files as geometry-less layers
    (ogr/ogrsf_frmts/shape); record-range partitioned like read_shapefile."""
    nrec, hdr_len, rec_len, fields = _read_dbf_header(dbf_path)
    if num_partitions is None:
        num_partitions = min(
            max(1, nrec // 2048), spark.sparkContext.defaultParallelism
        )
    splits = np.array_split(np.arange(nrec), num_partitions)
    ranges = [(int(sp[0]), int(sp[-1]) + 1) for sp in splits if len(sp)]
    rng_df = spark.createDataFrame(ranges, "rec_lo: long, rec_hi: long")

    # FID is virtual (see read_shapefile): a real "fid" attribute wins
    # the plain name and the record index falls back to "_fid"
    fid_col = "_fid" if any(f[0].lower() == "fid" for f in fields) else "fid"
    schema_fields = [T.StructField(fid_col, T.LongType())]
    for name, ftype, flen, fdec in fields:
        if ftype in ("N", "F"):
            t = T.DoubleType() if (fdec > 0) else T.LongType()
        elif ftype == "L":
            t = T.BooleanType()
        else:
            t = T.StringType()
        schema_fields.append(T.StructField(name, t))
    out_schema = T.StructType(schema_fields)

    def read_ranges(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                lo, hi = int(rr["rec_lo"]), int(rr["rec_hi"])
                rows: dict = {f.name: [] for f in out_schema.fields}
                with open(dbf_path, "rb") as fdb:
                    fdb.seek(hdr_len + lo * rec_len)
                    blob = fdb.read((hi - lo) * rec_len)
                for rec in range(hi - lo):
                    r = blob[rec * rec_len : (rec + 1) * rec_len]
                    rows[fid_col].append(lo + rec)
                    pos = 1
                    for name, ftype, flen, fdec in fields:
                        rows[name].append(
                            _dbf_value(r[pos : pos + flen], ftype, fdec)
                        )
                        pos += flen
                yield pd.DataFrame(rows)

    return rng_df.mapInPandas(read_ranges, schema=out_schema)


def _wkb_to_shp_parts(buf: bytes) -> tuple[int, list[np.ndarray]]:
    gtype, payload = W.parse(bytes(buf))
    if gtype == W.WKB_POINT:
        return SHP_POINT, [np.array([payload])]
    if gtype == W.WKB_LINESTRING:
        return SHP_POLYLINE, [payload]
    polys = [payload] if gtype == W.WKB_POLYGON else payload
    rings = []
    for p in polys:
        for i, r in enumerate(p):
            r = np.asarray(r, dtype=np.float64)
            if not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            area = _ring_signed_area(r)
            # exterior must be CW (area<0), holes CCW (area>0)
            if (i == 0 and area > 0) or (i > 0 and area < 0):
                r = r[::-1]
            rings.append(r)
    return SHP_POLYGON, rings


def write_shapefile(df: DataFrame, shp_path: str, wkb_col: str = "wkb") -> None:
    """Single-writer .shp/.shx/.dbf sink (sequential offsets by format);
    streams partitions with toLocalIterator — driver memory O(1 row)."""
    base = os.path.splitext(shp_path)[0]
    attrs = [
        f
        for f in df.schema.fields
        if f.name not in (wkb_col, "fid")
    ]
    fdefs = []
    for f in attrs:
        if isinstance(f.dataType, (T.LongType, T.IntegerType)):
            fdefs.append((f.name[:10], "N", 19, 0))
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            fdefs.append((f.name[:10], "N", 24, 15))
        else:
            fdefs.append((f.name[:10], "C", 80, 0))
    rec_len = 1 + sum(fl for _, _, fl, _ in fdefs)

    shx_entries = []
    stype_out = 0
    bx = [np.inf, np.inf, -np.inf, -np.inf]
    nrec = 0
    offset_words = 50  # 100-byte header
    shp_f = open(shp_path, "wb")
    dbf_f = open(base + ".dbf", "wb")
    try:
        shp_f.seek(100)
        dbf_hdr_len = 33 + 32 * len(fdefs)
        dbf_f.seek(dbf_hdr_len)
        for r in df.toLocalIterator():
            d = r.asDict()
            stype, parts = _wkb_to_shp_parts(d[wkb_col])
            stype_out = stype
            if stype == SHP_POINT:
                content = struct.pack("<idd", SHP_POINT, parts[0][0, 0], parts[0][0, 1])
            else:
                pts = np.vstack(parts)
                starts, acc = [], 0
                for p in parts:
                    starts.append(acc)
                    acc += len(p)
                content = (
                    struct.pack(
                        "<idddd",
                        stype,
                        pts[:, 0].min(),
                        pts[:, 1].min(),
                        pts[:, 0].max(),
                        pts[:, 1].max(),
                    )
                    + struct.pack("<ii", len(parts), len(pts))
                    + np.asarray(starts, dtype="<i4").tobytes()
                    + pts.astype("<f8").tobytes()
                )
            allpts = np.vstack(parts)
            bx[0] = min(bx[0], allpts[:, 0].min())
            bx[1] = min(bx[1], allpts[:, 1].min())
            bx[2] = max(bx[2], allpts[:, 0].max())
            bx[3] = max(bx[3], allpts[:, 1].max())
            nrec += 1
            clen_words = len(content) // 2
            shp_f.write(struct.pack(">ii", nrec, clen_words))
            shp_f.write(content)
            shx_entries.append((offset_words, clen_words))
            offset_words += 4 + clen_words
            # dbf row
            row = b" "
            for (name, ftype, flen, fdec), f in zip(fdefs, attrs):
                v = d[f.name]
                if v is None:
                    cell = b" " * flen
                elif ftype == "N" and fdec == 0:
                    cell = str(int(v)).rjust(flen)[:flen].encode("ascii")
                elif ftype == "N":
                    cell = f"{float(v):.{fdec}f}".rjust(flen)[:flen].encode("ascii")
                else:
                    cell = str(v)[:flen].ljust(flen).encode("ascii", "replace")
                row += cell
            dbf_f.write(row)
        dbf_f.write(b"\x1a")
        # headers
        total_words = offset_words
        hdr = struct.pack(
            ">iiiiiii", 9994, 0, 0, 0, 0, 0, total_words
        ) + struct.pack("<iidddddddd", 1000, stype_out, bx[0], bx[1], bx[2], bx[3], 0, 0, 0, 0)
        shp_f.seek(0)
        shp_f.write(hdr)
        dbf_f.seek(0)
        dbf_f.write(
            struct.pack("<BBBBIHH20x", 3, 24, 1, 1, nrec, dbf_hdr_len, rec_len)
        )
        for name, ftype, flen, fdec in fdefs:
            dbf_f.write(
                name.encode("ascii").ljust(11, b"\x00")
                + ftype.encode("ascii")
                + b"\x00" * 4
                + bytes([flen, fdec])
                + b"\x00" * 14
            )
        dbf_f.write(b"\r")
    finally:
        shp_f.close()
        dbf_f.close()
    with open(base + ".shx", "wb") as fx:
        fx.write(
            struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, 50 + 4 * nrec)
            + struct.pack(
                "<iidddddddd", 1000, stype_out, bx[0], bx[1], bx[2], bx[3], 0, 0, 0, 0
            )
        )
        for off, clen in shx_entries:
            fx.write(struct.pack(">ii", off, clen))


# --------------------------------------------------------------------------
# GeoPackage (sqlite3) — rowid-range partitioned read
# --------------------------------------------------------------------------

_GPKG_SRS = (
    "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER "
    "PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER "
    "NOT NULL, definition TEXT NOT NULL, description TEXT)"
)


def _gpkg_blob(wkb_buf: bytes | None, srs_id: int = 4326) -> bytes | None:
    """Standard GeoPackageBinary header (magic GP, v0, flags: envelope=1
    LE) + envelope + ISO WKB (gpkg/ogrgeopackagelayer.cpp)."""
    if wkb_buf is None:
        return None
    xmin, ymin, xmax, ymax = W.bbox(wkb_buf)
    flags = 0b00000011  # LE byte order + envelope indicator 1 (XY)
    return (
        b"GP"
        + bytes([0, flags])
        + struct.pack("<i", srs_id)
        + struct.pack("<dddd", xmin, xmax, ymin, ymax)
        + wkb_buf
    )


def _gpkg_unblob(blob: bytes) -> bytes | None:
    if blob is None:
        return None
    blob = bytes(blob)
    assert blob[:2] == b"GP", "not a GeoPackage geometry blob"
    flags = blob[3]
    env = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env]
    wkb = blob[8 + env_len :]
    # GeoPackage allows curved ISO types (CircularString & friends,
    # 8-12); the engine's geometry kernels are linear, so linearize on
    # ingest (SURVEY §1.2; reference analog:
    # OGRGeometryFactory::forceTo / getLinearGeometry)
    if len(wkb) >= 5:
        gtype = int.from_bytes(wkb[1:5], "little") % 1000
        if 8 <= gtype <= 12 or gtype == 7:
            from gdal_spark.functions.curves import (
                has_curve_geometry, linearize_wkb)

            if has_curve_geometry(wkb):
                wkb = linearize_wkb(wkb)
    return wkb


def write_gpkg(
    df: DataFrame, path: str, layer: str = "features", wkb_col: str = "wkb",
    srs_id: int = 4326,
) -> None:
    """GeoPackage sink with the full required metadata tables
    (gpkg_spatial_ref_sys/contents/geometry_columns). Single-writer
    (sqlite); streams toLocalIterator."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")
        con.execute(_GPKG_SRS)
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES "
            "('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL),"
            "('undefined', -1, 'NONE', -1, 'undefined', NULL),"
            "('undefined', 0, 'NONE', 0, 'undefined', NULL)"
        )
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, "
            "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT "
            "DEFAULT '', last_change DATETIME, min_x DOUBLE, min_y DOUBLE, "
            "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
            "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
            "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
            "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
        )
        attrs = [f for f in df.schema.fields if f.name not in (wkb_col, "fid")]

        def sql_type(t):
            if isinstance(t, (T.LongType, T.IntegerType)):
                return "INTEGER"
            if isinstance(t, (T.DoubleType, T.FloatType)):
                return "REAL"
            return "TEXT"

        cols_ddl = ", ".join(f'"{f.name}" {sql_type(f.dataType)}' for f in attrs)
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY, geom BLOB'
            + (", " + cols_ddl if cols_ddl else "")
            + ")"
        )
        names = ", ".join(f'"{f.name}"' for f in attrs)
        ph = ", ".join("?" for _ in range(2 + len(attrs)))
        ins = f'INSERT INTO "{layer}" (fid, geom{", " + names if names else ""}) VALUES ({ph})'
        bx = [np.inf, np.inf, -np.inf, -np.inf]
        has_fid = "fid" in df.columns
        i = 0
        for r in df.toLocalIterator():
            d = r.asDict()
            wkb_buf = bytes(d[wkb_col]) if d[wkb_col] is not None else None
            if wkb_buf is not None:
                x0, y0, x1, y1 = W.bbox(wkb_buf)
                bx = [min(bx[0], x0), min(bx[1], y0), max(bx[2], x1), max(bx[3], y1)]
            fid = int(d["fid"]) if has_fid else i
            con.execute(
                ins,
                tuple(
                    [fid, _gpkg_blob(wkb_buf, srs_id)]
                    + [d[f.name] for f in attrs]
                ),
            )
            i += 1
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?, 'features', ?, '', "
            "datetime('now'), ?, ?, ?, ?, ?)",
            (layer, layer, bx[0], bx[1], bx[2], bx[3], srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'GEOMETRY', ?, 0, 0)",
            (layer, srs_id),
        )
        con.commit()
    finally:
        con.close()


def read_gpkg(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """GeoPackage -> (fid, wkb, *attrs), rowid-range partitioned: the
    driver reads only gpkg metadata + min/max rowid; each task opens the
    file read-only (sqlite URI mode=ro, safe concurrent readers) and
    scans its own rowid range — an index-organized range scan per task,
    no driver bottleneck."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if layer is None:
            layer = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
            ).fetchone()[0]
        geom_col = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
            (layer,),
        ).fetchone()[0]
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        lo_hi = con.execute(f'SELECT min(rowid), max(rowid) FROM "{layer}"').fetchone()
    finally:
        con.close()
    if lo_hi[0] is None:
        raise ValueError(f"empty gpkg layer {layer}")
    lo, hi = int(lo_hi[0]), int(lo_hi[1]) + 1
    attrs = [
        (name, ctype.upper())
        for _, name, ctype, _, _, pk in info
        if name != geom_col and not pk
    ]
    pk_col = next((name for _, name, _, _, _, pk in info if pk), "rowid")
    if num_partitions is None:
        num_partitions = min(
            max(1, (hi - lo) // 4096), spark.sparkContext.defaultParallelism
        )
    bounds = np.linspace(lo, hi, num_partitions + 1).astype(np.int64)
    ranges = [
        (int(bounds[i]), int(bounds[i + 1])) for i in range(num_partitions)
        if bounds[i] < bounds[i + 1]
    ]
    rng_df = spark.createDataFrame(ranges, "lo: long, hi: long")

    def sp_type(ct: str):
        if ct.startswith("INT"):
            return T.LongType()
        if ct in ("REAL", "DOUBLE", "FLOAT"):
            return T.DoubleType()
        return T.StringType()

    out_schema = T.StructType(
        [T.StructField("fid", T.LongType()), T.StructField("wkb", T.BinaryType())]
        + [T.StructField(n, sp_type(ct)) for n, ct in attrs]
    )
    names = [n for n, _ in attrs]
    sel = ", ".join([pk_col, f'"{geom_col}"'] + [f'"{n}"' for n in names])

    def read_ranges(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        f'SELECT {sel} FROM "{layer}" WHERE rowid >= ? AND rowid < ?',
                        (int(rr["lo"]), int(rr["hi"])),
                    ).fetchall()
                finally:
                    c.close()
                out = {f.name: [] for f in out_schema.fields}
                for row in rows:
                    out["fid"].append(row[0])
                    out["wkb"].append(_gpkg_unblob(row[1]))
                    for j, n in enumerate(names):
                        out[n].append(row[2 + j])
                yield pd.DataFrame(out)

    return rng_df.mapInPandas(read_ranges, schema=out_schema)


# --------------------------------------------------------------------------
# Arrow IPC / Feather v2 (ogr/ogrsf_frmts/arrow OGRFeatherDriver)
# --------------------------------------------------------------------------
#
# GDAL's Feather driver reads/writes the Arrow IPC file format with the
# geometry column as WKB binary carrying the geoarrow.wkb extension-name
# metadata (GEOARROW_EXTENSION_NAME, ogrfeatherwriterdataset.cpp). The
# engine's wire format is already WKB, so the mapping is direct: one IPC
# file per Spark partition on write (embarrassingly parallel), one file
# per task on read — the same splittability contract as the reference's
# per-record-batch scan (GetArrowStream).

_ARROW_GEO_META = {b"ARROW:extension:name": b"geoarrow.wkb"}


def _arrow_to_spark_type(t) -> T.DataType:
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_integer(t):
        return T.LongType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_floating(t):
        return T.DoubleType()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType()
    return T.StringType()


def write_arrow_ipc(df: DataFrame, path: str, wkb_col: str = "wkb") -> None:
    """Arrow IPC sink: each partition streams its rows into its own
    .arrow file (Feather v2 layout), geometry column tagged with the
    geoarrow.wkb extension name exactly like OGRFeatherWriter."""
    import uuid

    os.makedirs(path, exist_ok=True)
    out_schema = T.StructType([T.StructField("n", T.LongType())])

    def sink(batches):
        import pyarrow as pa
        import pyarrow.ipc

        tables = [
            pa.Table.from_pandas(pdf, preserve_index=False) for pdf in batches
        ]
        n = 0
        if tables:
            t = pa.concat_tables(tables)
            if wkb_col in t.column_names:
                i = t.column_names.index(wkb_col)
                f = t.schema.field(i).with_metadata(_ARROW_GEO_META)
                t = t.cast(pa.schema([
                    f if j == i else t.schema.field(j)
                    for j in range(len(t.column_names))
                ]))
            fn = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
            with pa.OSFile(fn, "wb") as fh, pa.ipc.new_file(fh, t.schema) as w:
                w.write_table(t)
            n = t.num_rows
        yield pd.DataFrame({"n": [n]})

    # force the write to happen (count of part sizes, driver-side scalar)
    df.mapInPandas(sink, schema=out_schema).agg({"n": "sum"}).collect()


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC scan: footer schema read driver-side, then one file per
    task (mapInPandas over the file list — the distributed analog of the
    reference's per-record-batch ArrowStream read)."""
    import pyarrow as pa
    import pyarrow.ipc

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if p.endswith(".arrow")
        )
    else:
        files = [path]
    if not files:
        raise ValueError(f"no .arrow files under {path}")
    arrow_schema = pa.ipc.open_file(files[0]).schema
    out_schema = T.StructType(
        [
            T.StructField(f.name, _arrow_to_spark_type(f.type))
            for f in arrow_schema
        ]
    )
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        len(files)
    )

    def load(batches):
        import pyarrow as pa
        import pyarrow.ipc

        for pdf in batches:
            for p in pdf["path"]:
                yield pa.ipc.open_file(p).read_all().to_pandas()

    return fdf.mapInPandas(load, schema=out_schema)


# --------------------------------------------------------------------------
# ogr2ogr-style dispatch
# --------------------------------------------------------------------------

READERS = {
    "geojson": read_geojson,
    "geojsonseq": read_geojson_seq,
    "csv": read_csv_wkt,
    "shapefile": read_shapefile,
    "gpkg": read_gpkg,
    "arrow": read_arrow_ipc,
}
WRITERS = {
    "geojson": write_geojson,
    "geojsonseq": write_geojson_seq,
    "csv": write_csv_wkt,
    "shapefile": write_shapefile,
    "gpkg": write_gpkg,
    "arrow": write_arrow_ipc,
}


def convert(
    spark: SparkSession,
    src: str,
    src_fmt: str,
    dst: str,
    dst_fmt: str,
    s_srs: str | None = None,
    t_srs: str | None = None,
    where: str | None = None,
    select: list[str] | None = None,
    limit: int | None = None,
    clipsrc: tuple[float, float, float, float] | None = None,
    simplify: float | None = None,
    segmentize: float | None = None,
) -> int:
    """ogr2ogr src->dst: read with one driver, write with another;
    returns the feature count moved (apps/ogr2ogr_lib.cpp composition).

    Option order follows the reference's per-feature pipeline
    (ogr2ogr_lib.cpp SetupTargetLayer/Translate): -where and -spat/
    -clipsrc filter first (clipsrc also CLIPS geometry to the rect,
    dropping features whose geometry vanishes), then -segmentize /
    -simplify transform the clipped geometry, -select prunes fields,
    -limit caps the count, and -s_srs/-t_srs reprojects last. Filters
    and projection go through Catalyst (pushdown); geometry steps are
    Arrow-batched kernels."""
    df = READERS[src_fmt](spark, src)
    if where is not None:
        df = df.filter(where)
    if clipsrc is not None:
        import pandas as pd

        from gdal_spark.functions.geom import clip_wkb_to_box

        xmin, ymin, xmax, ymax = (float(v) for v in clipsrc)

        @F.pandas_udf(T.BinaryType())
        def clip_udf(col: pd.Series) -> pd.Series:
            out = []
            for v in col:
                if v is None:
                    out.append(None)
                    continue
                c = clip_wkb_to_box(bytes(v), xmin, ymin, xmax, ymax)
                out.append(None if c is None else bytearray(c))
            return pd.Series(out)

        df = df.withColumn("wkb", clip_udf(F.col("wkb"))).filter(
            F.col("wkb").isNotNull()
        )
    if segmentize is not None or simplify is not None:
        import pandas as pd

        from gdal_spark.functions import simplify as S

        seg, tol = segmentize, simplify

        @F.pandas_udf(T.BinaryType())
        def geom_udf(col: pd.Series) -> pd.Series:
            out = []
            for v in col:
                if v is None:
                    out.append(None)
                    continue
                b = bytes(v)
                if seg is not None:
                    b = S.segmentize_wkb(b, seg)
                if tol is not None:
                    b = S.simplify_wkb(b, tol)
                out.append(None if b is None else bytearray(b))
            return pd.Series(out)

        df = df.withColumn("wkb", geom_udf(F.col("wkb")))
    if select is not None:
        keep = [c for c in df.columns if c in ("fid", "wkb")] + [
            c for c in select if c in df.columns
        ]
        df = df.select(*keep)
    if limit is not None:
        df = df.limit(limit)
    if t_srs is not None:
        from gdal_spark.operators.vectorops import reproject_wkb

        df = reproject_wkb(df, s_srs or "EPSG:4326", t_srs)
    WRITERS[dst_fmt](df, dst)
    return df.count()
