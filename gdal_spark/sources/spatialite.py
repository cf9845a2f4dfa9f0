"""SQLite / SpatiaLite vector driver (ogr/ogrsf_frmts/sqlite).

Geometry BLOB codec per OGRSQLiteLayer::ImportSpatiaLiteGeometry /
ExportSpatiaLiteGeometry (ogrsqlitelayer.cpp):

  * blob = 0x00, endian byte (0x01 = LE), SRID int32, MBR (4 doubles),
    0x7C marker, geometry body, 0xFE terminator;
  * class codes (ogr_sqlite.h:66-110): 1-7 = Point/LineString/Polygon/
    MultiPoint/MultiLineString/MultiPolygon/GeometryCollection XY,
    +1000 XYZ, +2000 XYM, +3000 XYZM, +1000000 = "compressed" XY
    (+1001000 XYZ): intermediate vertices stored as float32 deltas from
    the previous vertex, first/last vertices as full doubles
    (ogrsqlitelayer.cpp:1499-1566, 2117-2218);
  * sub-geometries of multi/collection classes are each preceded by an
    0x69 entity marker + their own class int32 (ogrsqlitelayer.cpp:2638).

Layer discovery reads ``geometry_columns`` in all three historical
shapes: SpatiaLite <4 (``type`` TEXT), SpatiaLite >=4 (``geometry_type``
INTEGER), and OGR-SQLite (``geometry_format`` TEXT — 'WKB' blobs pass
through unconverted).

Distributed scan: rowid-range partitioned exactly like read_gpkg —
metadata + min/max rowid driver-side, then each task opens the file
read-only (URI mode=ro) and range-scans its slice. Writers emit either
plain-WKB OGR-SQLite tables or SpatiaLite blobs.
"""

from __future__ import annotations

import math
import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SPLITE_POINT = 1
SPLITE_LINESTRING = 2
SPLITE_POLYGON = 3
SPLITE_MULTIPOINT = 4
SPLITE_MULTILINESTRING = 5
SPLITE_MULTIPOLYGON = 6
SPLITE_COLLECTION = 7
COMPR_OFFSET = 1000000


# ---------------------------------------------------------------------------
# blob -> WKB
# ---------------------------------------------------------------------------


def _rd(fmt, buf, pos, le):
    e = "<" if le else ">"
    vals = struct.unpack_from(e + fmt, buf, pos)
    return vals, pos + struct.calcsize(fmt)


def _read_coords(buf, pos, n, le, ndim):
    """n uncompressed vertices of ndim doubles."""
    e = "<" if le else ">"
    arr = np.frombuffer(buf, dtype=e + "f8", count=n * ndim, offset=pos)
    return arr.reshape(n, ndim), pos + 8 * n * ndim


def _read_compressed_ring(buf, pos, n, le, ndim):
    """Compressed vertex stream: first/last full doubles, intermediates
    float32 deltas from the previous vertex
    (ogrsqlitelayer.cpp:1527-1566)."""
    e = "<" if le else ">"
    out = np.empty((n, ndim), dtype=np.float64)
    (first, pos) = (
        struct.unpack_from(e + "d" * ndim, buf, pos),
        pos + 8 * ndim,
    )
    out[0] = first
    for i in range(1, n - 1):
        deltas = struct.unpack_from(e + "f" * ndim, buf, pos)
        pos += 4 * ndim
        out[i] = out[i - 1] + np.float64(deltas)
    if n > 1:
        last = struct.unpack_from(e + "d" * ndim, buf, pos)
        pos += 8 * ndim
        out[n - 1] = last
    return out, pos


def _wkb_geom(code: int, body: bytes) -> bytes:
    return b"\x01" + struct.pack("<I", code) + body


def _parse_class(buf, pos, cls, le):
    """One geometry body of the given class -> (standard little-endian
    WKB geometry, new pos)."""
    compressed = cls >= COMPR_OFFSET
    base = cls - COMPR_OFFSET if compressed else cls
    zm = base // 1000  # 0 XY, 1 XYZ, 2 XYM, 3 XYZM
    kind = base % 1000
    ndim = 2 + (1 if zm in (1, 2) else 0) + (1 if zm == 3 else 0)
    wkb_code = kind + (1000 if zm == 1 else 2000 if zm == 2 else 3000 if zm == 3 else 0)

    def pack(arr):
        return np.ascontiguousarray(arr, dtype="<f8").tobytes()

    if kind == SPLITE_POINT:
        (vals, pos) = _rd("d" * ndim, buf, pos, le)
        return _wkb_geom(wkb_code, struct.pack("<" + "d" * ndim, *vals)), pos
    if kind == SPLITE_LINESTRING:
        ((n,), pos) = _rd("i", buf, pos, le)
        if compressed:
            arr, pos = _read_compressed_ring(buf, pos, n, le, ndim)
        else:
            arr, pos = _read_coords(buf, pos, n, le, ndim)
        return _wkb_geom(wkb_code, struct.pack("<I", n) + pack(arr)), pos
    if kind == SPLITE_POLYGON:
        ((nr,), pos) = _rd("i", buf, pos, le)
        body = struct.pack("<I", nr)
        for _ in range(nr):
            ((n,), pos) = _rd("i", buf, pos, le)
            if compressed:
                arr, pos = _read_compressed_ring(buf, pos, n, le, ndim)
            else:
                arr, pos = _read_coords(buf, pos, n, le, ndim)
            body += struct.pack("<I", n) + pack(arr)
        return _wkb_geom(wkb_code, body), pos
    if kind in (SPLITE_MULTIPOINT, SPLITE_MULTILINESTRING,
                SPLITE_MULTIPOLYGON, SPLITE_COLLECTION):
        ((ng,), pos) = _rd("i", buf, pos, le)
        parts = []
        for _ in range(ng):
            if buf[pos] != 0x69:
                raise ValueError("missing 0x69 sub-geometry marker")
            pos += 1
            ((sub_cls,), pos) = _rd("i", buf, pos, le)
            wkb_sub, pos = _parse_class(buf, pos, sub_cls, le)
            parts.append(wkb_sub)
        return (
            _wkb_geom(wkb_code, struct.pack("<I", ng) + b"".join(parts)),
            pos,
        )
    raise ValueError(f"unsupported spatialite class {cls}")


def spatialite_to_wkb(blob: bytes | None) -> tuple[int, bytes] | None:
    """SpatiaLite geometry BLOB -> (srid, standard WKB)."""
    if blob is None:
        return None
    buf = bytes(blob)
    if buf[0] != 0x00:
        raise ValueError("not a spatialite geometry blob")
    le = buf[1] == 0x01
    ((srid,), _) = _rd("i", buf, 2, le)
    if buf[38] != 0x7C:
        raise ValueError("missing MBR end marker")
    ((cls,), pos) = _rd("i", buf, 39, le)
    wkb, pos = _parse_class(buf, pos, cls, le)
    return srid, wkb


# ---------------------------------------------------------------------------
# WKB -> blob
# ---------------------------------------------------------------------------


def _wkb_read_header(buf, pos):
    le = buf[pos] == 1
    e = "<" if le else ">"
    (code,) = struct.unpack_from(e + "I", buf, pos + 1)
    return le, code, pos + 5


def _export_body(buf, pos, le, code, out, compressed):
    e = "<" if le else ">"
    zm = code // 1000
    kind = code % 1000
    ndim = 2 + (1 if zm in (1, 2) else 0) + (1 if zm == 3 else 0)

    def coords(n, p):
        arr = np.frombuffer(buf, dtype=e + "f8", count=n * ndim, offset=p)
        return arr.reshape(n, ndim).astype(np.float64), p + 8 * n * ndim

    def emit_ring(arr):
        n = len(arr)
        out.append(struct.pack("<i", n))
        if compressed and n > 2:
            out.append(struct.pack("<" + "d" * ndim, *arr[0]))
            prev = arr[0].copy()
            for i in range(1, n - 1):
                d = (arr[i] - prev).astype(np.float32)
                out.append(struct.pack("<" + "f" * ndim, *d))
                prev = prev + d.astype(np.float64)
            out.append(struct.pack("<" + "d" * ndim, *arr[n - 1]))
        else:
            out.append(np.ascontiguousarray(arr, dtype="<f8").tobytes())

    pts = []
    if kind == SPLITE_POINT:
        vals = struct.unpack_from(e + "d" * ndim, buf, pos)
        pos += 8 * ndim
        out.append(struct.pack("<" + "d" * ndim, *vals))
        pts.append(np.array([vals[:2]]))
    elif kind == SPLITE_LINESTRING:
        (n,) = struct.unpack_from(e + "I", buf, pos)
        pos += 4
        arr, pos = coords(n, pos)
        emit_ring(arr)
        pts.append(arr[:, :2])
    elif kind == SPLITE_POLYGON:
        (nr,) = struct.unpack_from(e + "I", buf, pos)
        pos += 4
        out.append(struct.pack("<i", nr))
        for _ in range(nr):
            (n,) = struct.unpack_from(e + "I", buf, pos)
            pos += 4
            arr, pos = coords(n, pos)
            emit_ring(arr)
            pts.append(arr[:, :2])
    else:  # multi / collection
        (ng,) = struct.unpack_from(e + "I", buf, pos)
        pos += 4
        out.append(struct.pack("<i", ng))
        for _ in range(ng):
            sle, scode, pos = _wkb_read_header(buf, pos)
            out.append(b"\x69")
            sub_cls = _class_of(scode, compressed)
            out.append(struct.pack("<i", sub_cls))
            pos, sub_pts = _export_body(buf, pos, sle, scode, out, compressed)
            pts.extend(sub_pts)
    return pos, pts


def _class_of(wkb_code: int, compressed: bool) -> int:
    kind = wkb_code % 1000
    zm = wkb_code // 1000
    cls = kind + (1000 if zm == 1 else 2000 if zm == 2 else 3000 if zm == 3 else 0)
    # points are never compressed; compression applies to line/polygon
    # families (CanBeCompressedSpatialiteGeometry, ogrsqlitelayer.cpp:2921)
    if compressed and kind != SPLITE_POINT:
        cls += COMPR_OFFSET
    return cls


def wkb_to_spatialite(wkb: bytes | None, srid: int = 4326,
                      compressed: bool = False) -> bytes | None:
    """Standard WKB -> SpatiaLite geometry BLOB (ExportSpatiaLiteGeometry)."""
    if wkb is None:
        return None
    buf = bytes(wkb)
    le, code, pos = _wkb_read_header(buf, 0)
    out: list[bytes] = []
    out.append(struct.pack("<i", _class_of(code, compressed)))
    _, pts = _export_body(buf, pos, le, code, out, compressed)
    allpts = np.vstack(pts) if pts else np.zeros((1, 2))
    head = bytearray()
    head.append(0x00)
    head.append(0x01)
    head += struct.pack("<i", srid)
    head += struct.pack(
        "<dddd",
        float(allpts[:, 0].min()), float(allpts[:, 1].min()),
        float(allpts[:, 0].max()), float(allpts[:, 1].max()),
    )
    head.append(0x7C)
    return bytes(head) + b"".join(out) + b"\xfe"


# ---------------------------------------------------------------------------
# layer discovery (the three geometry_columns dialects)
# ---------------------------------------------------------------------------

_TYPE_NAMES = {
    0: "GEOMETRY", 1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def list_layers(path: str) -> list[dict]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cols = [r[1] for r in con.execute("PRAGMA table_info(geometry_columns)")]
        if not cols:
            return []
        rows = con.execute("SELECT * FROM geometry_columns").fetchall()
    finally:
        con.close()
    out = []
    for row in rows:
        rec = dict(zip(cols, row))
        gtype = rec.get("geometry_type", rec.get("type", 0))
        if isinstance(gtype, int):
            gtype = _TYPE_NAMES.get(gtype % 1000, "GEOMETRY")
        out.append(
            {
                "table": rec["f_table_name"],
                "geom_col": rec["f_geometry_column"],
                "type": str(gtype).upper(),
                "srid": int(rec.get("srid", -1) or -1),
                "format": str(rec.get("geometry_format", "SpatiaLite")),
            }
        )
    return out


# ---------------------------------------------------------------------------
# distributed scan / write
# ---------------------------------------------------------------------------


def read_spatialite(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """SQLite/SpatiaLite layer -> (fid, srid, wkb, *attrs). Rowid-range
    partitioned: metadata driver-side, per-task read-only range scans
    (the read_gpkg contract)."""
    layers = list_layers(path)
    if not layers:
        raise ValueError(f"no geometry_columns in {path}")
    meta = layers[0] if layer is None else next(
        l for l in layers if l["table"].lower() == layer.lower()
    )
    table, geom_col, fmt = meta["table"], meta["geom_col"], meta["format"]
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        lo_hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{table}"'
        ).fetchone()
    finally:
        con.close()
    if lo_hi[0] is None:
        raise ValueError(f"empty sqlite layer {table}")
    lo, hi = int(lo_hi[0]), int(lo_hi[1]) + 1
    attrs = [
        (name, (ctype or "").upper())
        for _, name, ctype, _, _, pk in info
        if name.lower() != geom_col.lower() and not pk
    ]
    pk_col = next((name for _, name, _, _, _, pk in info if pk), "rowid")
    if num_partitions is None:
        num_partitions = min(
            max(1, (hi - lo) // 4096), spark.sparkContext.defaultParallelism
        )
    bounds = np.linspace(lo, hi, num_partitions + 1).astype(np.int64)
    ranges = [
        (int(bounds[i]), int(bounds[i + 1]))
        for i in range(num_partitions)
        if bounds[i] < bounds[i + 1]
    ]
    rng_df = spark.createDataFrame(ranges, "lo: long, hi: long")

    def sp_type(ct: str):
        if ct.startswith("INT") or ct in ("BIGINT", "SMALLINT", "MEDIUMINT"):
            return T.LongType()
        if ct.startswith(("REAL", "DOUBLE", "FLOAT", "NUMERIC", "DECIMAL")):
            return T.DoubleType()
        return T.StringType()

    out_schema = T.StructType(
        [
            T.StructField("fid", T.LongType()),
            T.StructField("srid", T.IntegerType()),
            T.StructField("wkb", T.BinaryType()),
        ]
        + [T.StructField(n, sp_type(ct)) for n, ct in attrs]
    )
    names = [n for n, _ in attrs]
    sel = ", ".join([pk_col, f'"{geom_col}"'] + [f'"{n}"' for n in names])
    plain_wkb = fmt.upper() == "WKB"

    def read_ranges(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        f'SELECT {sel} FROM "{table}"'
                        " WHERE rowid >= ? AND rowid < ?",
                        (int(rr["lo"]), int(rr["hi"])),
                    ).fetchall()
                finally:
                    c.close()
                out = {f.name: [] for f in out_schema.fields}
                for row in rows:
                    out["fid"].append(row[0])
                    blob = row[1]
                    if blob is None:
                        out["srid"].append(None)
                        out["wkb"].append(None)
                    elif plain_wkb:
                        out["srid"].append(None)
                        out["wkb"].append(bytes(blob))
                    else:
                        srid, wkb = spatialite_to_wkb(blob)
                        out["srid"].append(srid)
                        out["wkb"].append(wkb)
                    for j, n in enumerate(names):
                        out[n].append(row[2 + j])
                yield pd.DataFrame(out)

    return rng_df.mapInPandas(read_ranges, schema=out_schema)


def write_spatialite(
    df: DataFrame,
    path: str,
    layer: str = "layer",
    wkb_col: str = "wkb",
    srid: int = 4326,
    geom_type: str = "GEOMETRY",
    spatialite: bool = True,
    compressed: bool = False,
) -> int:
    """DataFrame -> SQLite vector DB. spatialite=True writes SpatiaLite
    blobs + the v3 geometry_columns; False writes the OGR-SQLite dialect
    (plain WKB blobs, geometry_format='WKB'). SQLite is a single-writer
    store, so partitions are collected through toLocalIterator (bounded
    driver memory) — the distributed sinks for 100 TB outputs are the
    GeoParquet / FlatGeobuf / PMTiles writers."""
    cols = [c for c in df.columns if c != wkb_col]
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("CREATE TABLE spatial_ref_sys (srid INTEGER PRIMARY KEY,"
                    " auth_name TEXT, auth_srid INTEGER, srtext TEXT)")
        cur.execute(
            "INSERT INTO spatial_ref_sys VALUES (?, 'EPSG', ?, '')",
            (srid, srid),
        )
        if spatialite:
            cur.execute(
                "CREATE TABLE geometry_columns (f_table_name TEXT,"
                " f_geometry_column TEXT, type TEXT, coord_dimension TEXT,"
                " srid INTEGER, spatial_index_enabled INTEGER)"
            )
            cur.execute(
                "INSERT INTO geometry_columns VALUES (?, 'GEOMETRY', ?,"
                " 'XY', ?, 0)",
                (layer, geom_type, srid),
            )
        else:
            cur.execute(
                "CREATE TABLE geometry_columns (f_table_name TEXT,"
                " f_geometry_column TEXT, geometry_type INTEGER,"
                " coord_dimension INTEGER, srid INTEGER,"
                " geometry_format TEXT)"
            )
            cur.execute(
                "INSERT INTO geometry_columns VALUES (?, 'GEOMETRY', 0, 2,"
                " ?, 'WKB')",
                (layer, srid),
            )
        def sql_type(dt: T.DataType) -> str:
            if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType,
                               T.ByteType, T.BooleanType)):
                return "INTEGER"
            if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
                return "DOUBLE"
            return "TEXT"

        dtypes = {f.name: f.dataType for f in df.schema.fields}
        decl_defs = ", ".join(f'"{c}" {sql_type(dtypes[c])}' for c in cols)
        decls = ", ".join(f'"{c}"' for c in cols)
        cur.execute(
            f'CREATE TABLE "{layer}" (OGC_FID INTEGER PRIMARY KEY,'
            f" GEOMETRY BLOB{', ' + decl_defs if cols else ''})"
        )
        ph = ", ".join("?" for _ in range(1 + len(cols)))
        n = 0
        for row in df.toLocalIterator():
            d = row.asDict()
            wkb = d.get(wkb_col)
            if wkb is not None:
                wkb = bytes(wkb)
                blob = (
                    wkb_to_spatialite(wkb, srid, compressed)
                    if spatialite
                    else wkb
                )
            else:
                blob = None
            cur.execute(
                f'INSERT INTO "{layer}" (GEOMETRY'
                f"{', ' + decls if cols else ''}) VALUES ({ph})",
                [sqlite3.Binary(blob) if blob is not None else None]
                + [d[c] for c in cols],
            )
            n += 1
        con.commit()
    finally:
        con.close()
    return n
