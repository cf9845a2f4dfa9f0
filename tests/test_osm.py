"""OSM PBF/XML driver vs the reference's own autotest expectations
(autotest/ogr/ogr_osm.py test_ogr_osm_1 on data/osm/test.pbf and
test.osm)."""

import os

import pytest

from gdal_spark.sources import osm as O

DATA = "/root/reference/autotest/ogr/data/osm"


def _block(path):
    with open(path, "rb") as fh:
        for btype, off, size in O.scan_block_index(path):
            if btype == "OSMData":
                fh.seek(off)
                return O.parse_primitive_block(O._inflate_blob(fh.read(size)))


def test_parse_test_pbf():
    blk = _block(f"{DATA}/test.pbf")
    assert len(blk["nodes"]) == 9
    assert len(blk["ways"]) == 8
    assert len(blk["relations"]) == 5
    n3 = dict((n[0], n) for n in blk["nodes"])[3]
    assert (n3[1], n3[2]) == (3.0, 49.5)
    assert n3[3] == {"name": "Some interesting point", "foo": "bar", "bar": "baz"}
    w1 = blk["ways"][0]
    assert w1 == (1, [1, 2], {"highway": "motorway", "foo": "bar"})
    r1 = blk["relations"][0]
    assert r1 == (
        1,
        [(1, 2, "outer"), (1, 3, "inner")],
        {"type": "multipolygon", "natural": "forest"},
    )


def test_xml_matches_pbf():
    with open(f"{DATA}/test.osm", "rb") as fh:
        xml = O.parse_osm_xml(fh.read())
    pbf = _block(f"{DATA}/test.pbf")
    assert sorted(xml["nodes"]) == sorted(pbf["nodes"])
    assert sorted(xml["ways"]) == sorted(pbf["ways"])
    assert sorted(xml["relations"]) == sorted(pbf["relations"])


def test_writer_roundtrip(tmp_path):
    nodes = [
        (1, 2.0, 49.0, {}),
        (5, 3.1234567, 50.5, {"name": "x", "foo": "bar"}),
        (1000000007, -179.9999999, -89.0, {"ele": "12"}),
    ]
    ways = [(10, [1, 5, 1000000007], {"highway": "residential"}), (11, [5, 1], {})]
    rels = [(20, [(1, 10, "outer"), (0, 5, "")], {"type": "multipolygon"})]
    p = str(tmp_path / "t.osm.pbf")
    O.write_osm_pbf(p, nodes, ways, rels)
    blk = _block(p)
    assert blk["ways"] == ways
    assert blk["relations"] == rels
    for got, want in zip(blk["nodes"], nodes):
        assert got[0] == want[0] and got[3] == want[3]
        assert abs(got[1] - want[1]) < 5e-8 and abs(got[2] - want[2]) < 5e-8


def test_z_order_and_area_rules():
    assert O.z_order({"highway": "motorway"}) == 9
    assert O.z_order({"highway": "residential", "bridge": "yes"}) == 13
    assert O.z_order({"highway": "secondary", "tunnel": "true", "layer": "2"}) == 16
    assert O.is_closed_way_polygon({"area": "yes", "name": "x"})
    assert not O.is_closed_way_polygon({"area": "no", "natural": "wood"})
    assert O.is_closed_way_polygon({"natural": "wood"})
    assert O.is_closed_way_polygon({"highway": "platform"})
    assert not O.is_closed_way_polygon({"highway": "motorway"})
    assert not O.is_closed_way_polygon({"name": "id_6"})


@pytest.mark.parametrize("filename", ["test.pbf", "test.osm"])
def test_five_layers_autotest_parity(spark, filename):
    layers = O.osm_layers(spark, f"{DATA}/{filename}")

    pts = layers["points"].collect()
    assert len(pts) == 1
    p = pts[0]
    assert p.osm_id == "3"
    assert p.name == "Some interesting point"
    assert p.other_tags == '"foo"=>"bar","bar"=>"baz"'
    assert p.wkt == "POINT (3 49.5)"

    lines = {r.osm_id: r for r in layers["lines"].collect()}
    assert set(lines) == {"1", "6"}
    assert lines["1"].highway == "motorway"
    assert lines["1"].z_order == 9
    assert lines["1"].other_tags == '"foo"=>"bar"'
    assert lines["1"].wkt == "LINESTRING (2 49,3 50)"
    assert lines["6"].wkt == "LINESTRING (2 49,3 49,3 50,2 50,2 49)"

    mps = {(r.osm_id, r.osm_way_id): r for r in layers["multipolygons"].collect()}
    assert set(mps) == {("1", None), ("5", None), (None, "8")}
    forest = mps[("1", None)]
    assert forest.type == "multipolygon" and forest.natural == "forest"
    assert forest.wkt == (
        "MULTIPOLYGON (((2 49,3 49,3 50,2 50,2 49),"
        "(2.1 49.1,2.2 49.1,2.2 49.2,2.1 49.2,2.1 49.1)))"
    )
    assert mps[("5", None)].natural == "wood"  # inherited from outer way
    assert mps[(None, "8")].name == "standalone_polygon"

    mls = layers["multilinestrings"].collect()
    assert len(mls) == 1
    assert mls[0].osm_id == "3" and mls[0].type == "route"
    assert mls[0].wkt == "MULTILINESTRING ((2 49,3 50))"

    others = layers["other_relations"].collect()
    assert len(others) == 1
    assert others[0].osm_id == "4" and others[0].type == "other_type"
    assert others[0].wkt == (
        "GEOMETRYCOLLECTION (POINT (2 49),LINESTRING (2 49,3 50))"
    )
