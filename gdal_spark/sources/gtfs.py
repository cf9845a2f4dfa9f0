"""GTFS transit-feed driver (ogr/ogrsf_frmts/gtfs/ogrgtfsdriver.cpp —
re-derived).

Facts: a zip (or directory) of GTFS .txt CSVs; every file except
shapes.txt is a layer (stops and other lat/lon-bearing files get Point
geometry), trips get a LineString assembled from stop_times joined to
stops ordered by stop_sequence, and a synthetic shapes_geom layer
groups shapes.txt by shape_id ordered by shape_pt_sequence. Field
typing: date/start_date/end_date -> Date (YYYYMMDD -> YYYY/MM/DD),
arrival/departure times -> Time, *_type and stop_sequence ->
Integer, weekday flags -> boolean Integer, lat/lon and
shape_dist_traveled -> Real.
"""

from __future__ import annotations

import csv
import io
import zipfile

__all__ = ["gtfs_layers", "read_gtfs"]


def _typed(name: str, value: str):
    if value == "":
        return None
    if name in ("date", "start_date", "end_date"):
        v = value.strip('"')
        if len(v) == 8 and v.isdigit():
            return "%s/%s/%s" % (v[:4], v[4:6], v[6:8])
        return v
    if name in ("arrival_time", "departure_time"):
        return value.strip('"')
    if name in ("stop_lat", "stop_lon", "shape_pt_lat", "shape_pt_lon",
                "shape_dist_traveled"):
        try:
            return float(value.strip('"'))
        except ValueError:
            return None
    if "_type" in name or name in (
            "stop_sequence", "shape_pt_sequence", "monday", "tuesday",
            "wednesday", "thursday", "friday", "saturday", "sunday"):
        try:
            return int(value.strip('"'))
        except ValueError:
            return None
    return value.strip('"')


def _read_csv(data: bytes) -> list[dict]:
    text = data.decode("utf-8-sig", "replace")
    rows = list(csv.reader(io.StringIO(text)))
    if not rows:
        return []
    header = [h.strip() for h in rows[0]]
    out = []
    for row in rows[1:]:
        if not any(c.strip() for c in row):
            continue
        feat = {}
        for i, name in enumerate(header):
            feat[name] = _typed(name, row[i] if i < len(row) else "")
        out.append(feat)
    return out


def gtfs_layers(data: bytes) -> dict[str, list[dict]]:
    zf = zipfile.ZipFile(io.BytesIO(data))
    tables: dict[str, list[dict]] = {}
    for name in zf.namelist():
        if name.endswith(".txt"):
            tables[name[:-4].rsplit("/", 1)[-1]] = _read_csv(zf.read(name))

    stops_xy = {}
    for row in tables.get("stops", []):
        if row.get("stop_lat") is not None and \
                row.get("stop_lon") is not None:
            stops_xy[str(row.get("stop_id"))] = (row["stop_lon"],
                                                 row["stop_lat"])
    trip_pts: dict[str, list] = {}
    for row in tables.get("stop_times", []) or tables.get("stops", []):
        tid = row.get("trip_id")
        sid = str(row.get("stop_id"))
        seq = row.get("stop_sequence")
        if tid and sid in stops_xy and seq is not None:
            trip_pts.setdefault(str(tid), []).append((seq, stops_xy[sid]))

    layers: dict[str, list[dict]] = {}
    for name, rows in tables.items():
        if name == "shapes":
            continue
        feats = []
        for row in rows:
            f = dict(row)
            if row.get("stop_lat") is not None and \
                    row.get("stop_lon") is not None:
                f["wkt"] = "POINT (%.15g %.15g)" % (row["stop_lon"],
                                                    row["stop_lat"])
            elif name == "trips" and str(row.get("trip_id")) in trip_pts:
                pts = [xy for _, xy in sorted(trip_pts[str(row["trip_id"])],
                                              key=lambda t: t[0])]
                f["wkt"] = "LINESTRING (%s)" % ",".join(
                    "%.15g %.15g" % p for p in pts)
            feats.append(f)
        layers[name] = feats

    shape_pts: dict[str, list] = {}
    for row in tables.get("shapes", []):
        sid = str(row.get("shape_id"))
        if row.get("shape_pt_lat") is None:
            continue
        shape_pts.setdefault(sid, []).append(
            (row.get("shape_pt_sequence") or 0,
             (row["shape_pt_lon"], row["shape_pt_lat"])))
    if shape_pts:
        feats = []
        for sid in sorted(shape_pts):
            pts = [xy for _, xy in sorted(shape_pts[sid],
                                          key=lambda t: t[0])]
            feats.append({"shape_id": sid,
                          "wkt": "LINESTRING (%s)" % ",".join(
                              "%.15g %.15g" % p for p in pts)})
        layers["shapes_geom"] = feats
    return layers


def read_gtfs(spark, path: str):
    with open(path, "rb") as fh:
        layers = gtfs_layers(fh.read())
    rows = []
    for name, feats in layers.items():
        for f in feats:
            rows.append((name, f.get("wkt"),
                         {k: str(v) for k, v in f.items()
                          if k != "wkt" and v is not None}))
    return spark.createDataFrame(
        rows, "layer string, wkt string, fields map<string,string>")
