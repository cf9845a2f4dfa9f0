"""PMTiles v3 archive driver vs the reference's own autotest fixtures
(autotest/ogr/ogr_pmtiles.py, fixtures autotest/ogr/data/pmtiles/)."""

import collections
import json
import os

import pytest

from gdal_spark.sources import pmtiles as P

DATA = "/root/reference/autotest/ogr/data/pmtiles"


def _read(name):
    with open(os.path.join(DATA, name), "rb") as fh:
        return fh.read()


# ---------------------------------------------------------------------------
# pure codec parity
# ---------------------------------------------------------------------------


def test_poly_header_and_metadata():
    # test_ogr_pmtiles_read_basic metadata expectations
    data = _read("poly.pmtiles")
    h = P.deserialize_header(data)
    assert (h["min_zoom"], h["max_zoom"]) == (0, 5)
    assert h["tile_type"] == P.TILETYPE_MVT
    md = P.read_metadata(data)
    assert md["name"] == "poly"
    assert md["format"] == "pbf"
    assert md["minzoom"] == "0" and md["maxzoom"] == "5"
    assert md["scheme"] == "tms"
    assert md["type"] == "overlay"
    assert md["version"] == "2"
    assert md["description"] == ""


def test_poly_first_feature_fields():
    # first feature of the first max-zoom tile: AREA/EAS_ID/PRFEDEA
    data = _read("poly.pmtiles")
    z5 = sorted(
        e["tile_id"] for e in P.enumerate_entries(data)
        if P.tileid_to_zxy(e["tile_id"])[0] == 5
    )
    z, x, y = P.tileid_to_zxy(z5[0])
    tile = P.get_tile_bytes(data, z, x, y)
    layers = P.parse_mvt_tile(tile)
    assert layers[0]["name"] == "poly"
    f = layers[0]["features"][0]
    assert f["fields"]["AREA"] == 215229.266
    assert f["fields"]["EAS_ID"] == 168
    assert f["fields"]["PRFEDEA"] == "35043411"


def test_hilbert_tileid_roundtrip():
    for z in range(0, 17):
        n = (1 << z) - 1
        for x, y in {(0, 0), (n, 0), (0, n), (n, n), (n // 2, n // 3)}:
            tid = P.zxy_to_tileid(z, x, y)
            assert P.tileid_to_zxy(tid) == (z, x, y)
    # zoom base offsets: id 0,1,5,21 are the (z,0,0) corners... base = (4^z-1)/3
    for z in range(6):
        assert P.zxy_to_tileid(z, 0, 0) == ((1 << (2 * z)) - 1) // 3


def test_run_length_max():
    # test_ogr_pmtiles_run_length_max: feature count is exactly 1 << 32
    data = _read("run_length_max.pmtiles")
    ents = P.enumerate_entries(data)
    per_tile = sum(
        len(lyr["features"])
        for lyr in P.parse_mvt_tile(P.get_tile_bytes(data, 16, 0, 0))
    )
    assert sum(e["run_length"] for e in ents) * per_tile == 1 << 32
    # addressed range boundaries: last id resolves, one past it doesn't
    last_id = ents[-1]["tile_id"] + ents[-1]["run_length"] - 1
    z, x, y = P.tileid_to_zxy(last_id)
    assert P.get_tile_bytes(data, z, x, y) is not None
    z, x, y = P.tileid_to_zxy(last_id + 1)
    assert P.get_tile_bytes(data, z, x, y) is None


def test_leaf_directories_resolve_identically():
    # test_ogr_pmtiles_vsipmtiles ReadDir: zoom dirs 3,4,5
    plain = _read("ne_10m_admin_0_france.pmtiles")
    leafy = _read("ne_10m_admin_0_france_with_leaf_dir.pmtiles")
    assert P.deserialize_header(leafy)["leaf_dirs_bytes"] > 0
    e_plain = P.enumerate_entries(plain)
    e_leafy = P.enumerate_entries(leafy)
    key = lambda e: (e["tile_id"], e["run_length"])
    assert sorted(map(key, e_plain)) == sorted(map(key, e_leafy))
    zooms = collections.Counter(
        P.tileid_to_zxy(e["tile_id"])[0] for e in e_leafy
    )
    assert sorted(zooms) == [3, 4, 5]
    # same decompressed payload through both directory shapes
    z, x, y = P.tileid_to_zxy(e_plain[0]["tile_id"])
    assert P.get_tile_bytes(plain, z, x, y) == P.get_tile_bytes(leafy, z, x, y)


def test_directory_serialize_roundtrip():
    entries = [
        {"tile_id": 0, "offset": 0, "length": 10, "run_length": 1},
        {"tile_id": 3, "offset": 10, "length": 7, "run_length": 5},  # contig
        {"tile_id": 99, "offset": 4, "length": 6, "run_length": 1},  # backref
    ]
    assert P.deserialize_directory(P.serialize_directory(entries)) == entries


def test_header_serialize_roundtrip():
    h = P.deserialize_header(_read("poly.pmtiles"))
    assert P.deserialize_header(P.serialize_header(h)) == h


# ---------------------------------------------------------------------------
# write path
# ---------------------------------------------------------------------------


def _toy_tiles():
    from gdal_spark.sources.mvt import encode_mvt_tile, GEOM_POINT
    import numpy as np

    def tile(px, py, name):
        return encode_mvt_tile(
            [{
                "name": "layer",
                "extent": 4096,
                "features": [{
                    "type": GEOM_POINT,
                    "parts": [np.array([[px, py]])],
                    "fields": {"name": name},
                }],
            }]
        )

    same = tile(100, 200, "dup")
    # z1 Hilbert order: (0,0)=1 (0,1)=2 (1,1)=3 (1,0)=4 — ids 1,2,3 share
    # content and coalesce into one run-length entry; (2,0,0)=5 reuses the
    # payload offset but starts a fresh entry (offset matches, id contiguous,
    # run continues!) so use a distinct tile there
    return [
        (1, 0, 0, same),
        (1, 0, 1, same),
        (1, 1, 1, same),
        (1, 1, 0, tile(5, 5, "solo")),
        (2, 0, 0, tile(9, 9, "z2")),
    ]


def test_write_dedup_and_roundtrip(tmp_path):
    # mirrors test_ogr_pmtiles_write_from_mbtiles_deduplication: identical
    # payloads stored once, run-length coalescing on consecutive ids
    path = str(tmp_path / "toy.pmtiles")
    h = P.write_pmtiles(path, _toy_tiles())
    assert h["addressed_tiles_count"] == 5
    assert h["tile_contents_count"] == 3  # dup payload stored once
    assert h["tile_entries_count"] == 3  # ids 1,2,3 coalesce into one run
    data = open(path, "rb").read()
    back = {}
    for e in P.enumerate_entries(data):
        for i in range(e["run_length"]):
            z, x, y = P.tileid_to_zxy(e["tile_id"] + i)
            back[(z, x, y)] = P.get_tile_bytes(data, z, x, y)
    want = {(z, x, y): raw for z, x, y, raw in _toy_tiles()}
    assert back == want


def test_write_leaf_directories(tmp_path):
    # force the root over a tiny cap so entries spill into leaves
    from gdal_spark.sources.mvt import encode_mvt_tile, GEOM_POINT
    import numpy as np

    tiles = []
    for x in range(16):
        for y in range(16):
            raw = encode_mvt_tile(
                [{
                    "name": "layer",
                    "extent": 4096,
                    "features": [{
                        "type": GEOM_POINT,
                        "parts": [np.array([[x * 10 + 1, y * 10 + 1]])],
                        "fields": {"i": x * 16 + y},
                    }],
                }]
            )
            tiles.append((4, x, y, raw))
    path = str(tmp_path / "leafy.pmtiles")
    h = P.write_pmtiles(path, tiles, max_root_bytes=64, leaf_size=16)
    assert h["leaf_dirs_bytes"] > 0
    data = open(path, "rb").read()
    ents = P.enumerate_entries(data)
    assert len(ents) == 256
    got = P.get_tile_bytes(data, 4, 7, 9)
    assert got == dict(((z, x, y), r) for z, x, y, r in tiles)[(4, 7, 9)]


def test_pmtiles_from_mbtiles(tmp_path):
    # build a tiny MBTiles then convert (ogrpmtilesfrommbtiles.cpp)
    import sqlite3

    src = str(tmp_path / "src.mbtiles")
    con = sqlite3.connect(src)
    con.execute("CREATE TABLE metadata (name text, value text)")
    con.executemany(
        "INSERT INTO metadata VALUES (?, ?)",
        [("name", "toy"), ("format", "pbf"), ("minzoom", "1"), ("maxzoom", "2")],
    )
    con.execute(
        "CREATE TABLE tiles (zoom_level int, tile_column int, tile_row int,"
        " tile_data blob)"
    )
    for z, x, y, raw in _toy_tiles():
        con.execute(
            "INSERT INTO tiles VALUES (?, ?, ?, ?)",
            (z, x, (1 << z) - 1 - y, sqlite3.Binary(raw)),
        )
    con.commit()
    con.close()
    out = str(tmp_path / "out.pmtiles")
    h = P.pmtiles_from_mbtiles(src, out)
    assert h["addressed_tiles_count"] == 5 and h["tile_contents_count"] == 3
    data = open(out, "rb").read()
    assert P.read_metadata(data)["name"] == "toy"
    want = {(z, x, y): raw for z, x, y, raw in _toy_tiles()}
    assert P.get_tile_bytes(data, 1, 1, 0) == want[(1, 1, 0)]


# ---------------------------------------------------------------------------
# distributed scan
# ---------------------------------------------------------------------------


def test_read_pmtiles_spark(spark):
    # test_ogr_pmtiles_read_basic: 8 features at the default (max) zoom,
    # test_ogr_pmtiles_read_ZOOM_LEVEL: 1 feature at zoom 0
    path = os.path.join(DATA, "poly.pmtiles")
    df = P.read_pmtiles(spark, path)
    rows = df.collect()
    assert len(rows) == 8
    assert all(r.layer == "poly" for r in rows)
    assert all(r.wkt.startswith("MULTIPOLYGON") for r in rows)
    fields = [json.loads(r.fields_json) for r in rows]
    assert {f["EAS_ID"] for f in fields} == {158, 165, 166, 168, 169, 171, 173, 179}
    z0 = P.read_pmtiles(spark, path, zoom_level=0)
    assert z0.count() == 1
    with pytest.raises(ValueError, match="Invalid zoom level"):
        P.read_pmtiles(spark, path, zoom_level=6)


def test_read_pmtiles_leafdir_spark(spark):
    path = os.path.join(DATA, "ne_10m_admin_0_france_with_leaf_dir.pmtiles")
    plain = os.path.join(DATA, "ne_10m_admin_0_france.pmtiles")
    a = P.read_pmtiles(spark, path).select("z", "x", "y", "wkt").collect()
    b = P.read_pmtiles(spark, plain).select("z", "x", "y", "wkt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0
