"""PGDump SQL emitter vs the reference autotest expectations
(autotest/ogr/ogr_pgdump.py)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import wkb as W
from gdal_spark.sources.pgdump import (
    PGDumpLayer,
    PGField,
    PGGeomField,
    ewkb_hex,
    launder,
)

SQUARE = W.write_polygon(
    [np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])]
)


def _checker(sql):
    state = {"sql": sql}

    def check(needle):
        s = state["sql"]
        assert needle in s, f"{needle!r} not found in remainder:\n{s[:2000]}"
        state["sql"] = s[s.find(needle) + len(needle):]

    return check


def test_insert_mode_postgis15():
    """test_ogr_pgdump_1 shape: DIM=3, PostGIS 1.5, insert statements."""
    lyr = PGDumpLayer(
        "tpoly",
        postgis_version=1.5,
        fields=[
            PGField("AREA", "real"),
            PGField("EAS_ID", "integer"),
            PGField("PRFEDEA", "string"),
            PGField("SHORTNAME", "string", width=8),
        ],
        geom_fields=[PGGeomField(dim=3)],
    )
    lyr.add_feature(
        {"area": 215229.266, "eas_id": 168, "prfedea": "35043411"}, SQUARE
    )
    check = _checker(lyr.render())
    check('DROP TABLE IF EXISTS "public"."tpoly" CASCADE;')
    check("DELETE FROM geometry_columns WHERE f_table_name = 'tpoly' "
          "AND f_table_schema = 'public';")
    check("BEGIN;")
    check('CREATE TABLE "public"."tpoly"();')
    check('ALTER TABLE "public"."tpoly" ADD COLUMN "ogc_fid" SERIAL '
          'CONSTRAINT "tpoly_pk" PRIMARY KEY;')
    check("SELECT AddGeometryColumn('public','tpoly','wkb_geometry',-1,"
          "'GEOMETRY',3);")
    check('ALTER TABLE "public"."tpoly" ADD COLUMN "area" FLOAT8;')
    check('ALTER TABLE "public"."tpoly" ADD COLUMN "eas_id" INTEGER;')
    check('ALTER TABLE "public"."tpoly" ADD COLUMN "prfedea" VARCHAR;')
    check('ALTER TABLE "public"."tpoly" ADD COLUMN "shortname" VARCHAR(8);')
    # null SHORTNAME is omitted from the INSERT column list
    check('INSERT INTO "public"."tpoly" ("wkb_geometry", "area", "eas_id", '
          '"prfedea") VALUES (\'0103000080')
    check("215229.266, 168, '35043411');")
    check('CREATE INDEX "tpoly_wkb_geometry_geom_idx" ON "public"."tpoly" '
          'USING GIST ("wkb_geometry");')
    check("COMMIT;")


def test_copy_mode_quoted_idents_crlf():
    """test_ogr_pgdump_2 shape: COPY, quoted schema/table/geom names."""
    lyr = PGDumpLayer(
        'xx"yyy',
        schema='ano"ther_schema',
        use_copy=True,
        lineformat="CRLF",
        launder_mode="NO",
        fields=[
            PGField("area", "real"),
            PGField("eas_id", "integer"),
            PGField("prfedea", "string"),
            PGField("shortname", "string", width=8),
        ],
        geom_fields=[PGGeomField('the_"geom', "POLYGON", srid=4326)],
    )
    lyr.add_feature(
        {"area": 215229.266, "eas_id": 168, "prfedea": "35043411"}, SQUARE
    )
    sql = lyr.render()
    assert "\r\n" in sql
    check = _checker(sql)
    check('CREATE SCHEMA "ano""ther_schema";')
    check('DROP TABLE IF EXISTS "ano""ther_schema"."xx""yyy" CASCADE;')
    check('CREATE TABLE "ano""ther_schema"."xx""yyy"();')
    check('ALTER TABLE "ano""ther_schema"."xx""yyy" ADD COLUMN "ogc_fid" '
          'SERIAL CONSTRAINT "xx""yyy_pk" PRIMARY KEY;')
    check("SELECT AddGeometryColumn('ano\"ther_schema','xx\"yyy',"
          "'the_\"geom',4326,'POLYGON',2);")
    check('COPY "ano""ther_schema"."xx""yyy" ("the_""geom", "area", '
          '"eas_id", "prfedea", "shortname") FROM STDIN;')
    check("0103000020E6100000")
    check("\t215229.266\t168\t35043411\t\\N")
    check("\\.")
    check('CREATE INDEX "xx""yyy_the_""geom_geom_idx" ON '
          '"ano""ther_schema"."xx""yyy" USING GIST ("the_""geom");')
    check("COMMIT;")


def test_non_nullable_unique_comment():
    """test_ogr_pgdump_non_nullable_unique_comment."""
    lyr = PGDumpLayer(
        "test",
        fields=[
            PGField("field_not_nullable", "string", nullable=False,
                    comment="this field is not nullable"),
            PGField("field_nullable", "string", unique=True),
        ],
        geom_fields=[
            PGGeomField("geomfield_not_nullable", "POINT", srid=0,
                        nullable=False),
            PGGeomField("geomfield_nullable", "POINT", srid=0),
        ],
        gist_index=False,
    )
    pt = W.write_point(0.0, 0.0)
    lyr.add_feature({"field_not_nullable": "not_null"},
                    {"geomfield_not_nullable": pt})
    # missing non-nullable geometry -> error
    with pytest.raises(ValueError):
        lyr.add_feature({"field_not_nullable": "not_null"}, {})
    # missing non-nullable field -> error
    with pytest.raises(ValueError):
        lyr.add_feature({}, {"geomfield_not_nullable": pt})

    sql = lyr.render()
    check = _checker(sql)
    check('ALTER TABLE "public"."test" ADD COLUMN "field_not_nullable" '
          'VARCHAR NOT NULL;')
    check('COMMENT ON COLUMN "public"."test"."field_not_nullable" IS '
          "'this field is not nullable';")
    assert sql.count("COMMENT ON") == 1
    check('ALTER TABLE "public"."test" ADD COLUMN "field_nullable" '
          'VARCHAR UNIQUE;')
    check2 = _checker(sql)
    check2("SELECT AddGeometryColumn('public','test',"
           "'geomfield_not_nullable',0,'POINT',2);")
    check2('ALTER TABLE "test" ALTER COLUMN "geomfield_not_nullable" '
           'SET NOT NULL;')
    check2("SELECT AddGeometryColumn('public','test','geomfield_nullable',"
           "0,'POINT',2);")


def test_launder_modes():
    e = "é"
    assert launder(f"a{e}#") == f"a{e}_"
    assert launder(f"a{e}", ascii_mode=True) == "ae"
    assert launder("AREA-1") == "area_1"

    lyr = PGDumpLayer(f"a{e}#", fields=[PGField(f"b{e}#")],
                      launder_mode="YES")
    sql = lyr.render()
    assert f'"a{e}_"' in sql and f'"b{e}_"' in sql

    lyr = PGDumpLayer(f"a{e}#", fields=[PGField(f"b{e}#")],
                      launder_mode="NO")
    sql = lyr.render()
    assert f'"a{e}#"' in sql and f'"b{e}#"' in sql

    lyr = PGDumpLayer(f"a{e}", fields=[PGField(f"b{e}")],
                      launder_mode="ASCII")
    sql = lyr.render()
    assert '"ae"' in sql and '"be"' in sql


def test_skip_conflicts():
    lyr = PGDumpLayer(
        "skip_conflicts",
        fields=[PGField("str", "string")],
        geom_fields=[PGGeomField(gtype="POINT", srid=0)],
        skip_conflicts=True,
    )
    lyr.add_feature({"str": "foo"}, W.write_point(0.0, 1.0))
    assert ") ON CONFLICT DO NOTHING;" in lyr.render()


def test_ewkb_hex_flags():
    pt = W.write_point(1.0, 2.0)
    h2 = ewkb_hex(pt, srid=0, dim=2)
    assert h2.startswith("0101000000")
    h3 = ewkb_hex(pt, srid=0, dim=3)
    assert h3.startswith("0101000080")
    assert h3.endswith("0" * 16)  # z = 0 appended
    hs = ewkb_hex(pt, srid=4326, dim=2)
    assert hs.startswith("0101000020E6100000")
    # polygon with srid + z
    hz = ewkb_hex(SQUARE, srid=4326, dim=3)
    assert hz.startswith("01030000A0E6100000")


def test_copy_escaping_and_bool():
    lyr = PGDumpLayer(
        "esc", use_copy=True,
        fields=[PGField("s", "string"), PGField("b", "boolean")],
    )
    lyr.add_feature({"s": "a\tb\nc\\d", "b": True})
    sql = lyr.render()
    assert "a\\tb\\nc\\\\d\tt" in sql


def test_no_feature_layer():
    """test_ogr_pgdump_no_feature: schema-only dump still renders."""
    lyr = PGDumpLayer("empty", fields=[PGField("x", "integer64")])
    sql = lyr.render()
    assert 'ADD COLUMN "x" BIGINT;' in sql
    assert "INSERT" not in sql and "COPY" not in sql


def test_ewkb_hex_multi_and_collection():
    """MULTIPOINT/MULTILINESTRING/GEOMETRYCOLLECTION EWKB vs PostGIS
    golden hex (ST_AsEWKB output for the same geometries)."""
    from gdal_spark.functions.wkb import (
        write_collection,
        write_linestring,
        write_multilinestring,
        write_multipoint,
        write_point,
    )

    mp = write_multipoint([(0.0, 0.0), (1.0, 2.0)])
    assert ewkb_hex(mp, srid=0, dim=2) == (
        "010400000002000000"
        "010100000000000000000000000000000000000000"
        "0101000000000000000000F03F0000000000000040")

    ml = write_multilinestring([[(0.0, 0.0), (1.0, 1.0)],
                                [(2.0, 2.0), (3.0, 3.0)]])
    assert ewkb_hex(ml, srid=0, dim=2) == (
        "010500000002000000"
        "010200000002000000"
        "00000000000000000000000000000000"
        "000000000000F03F000000000000F03F"
        "010200000002000000"
        "00000000000000400000000000000040"
        "00000000000008400000000000000840")

    gc = write_collection([
        write_point(2.0, 3.0),
        write_linestring([(2.0, 3.0), (3.0, 4.0)]),
    ])
    assert ewkb_hex(gc, srid=0, dim=2) == (
        "010700000002000000"
        "010100000000000000000000400000000000000840"
        "010200000002000000"
        "00000000000000400000000000000840"
        "00000000000008400000000000001040")

    # SRID flag on the outer header only; Z flag propagates to children
    h = ewkb_hex(mp, srid=4326, dim=2)
    assert h.startswith("0104000020E6100000") and "20E610" not in h[18:]
    hz = ewkb_hex(mp, srid=0, dim=3)
    assert hz.startswith("0104000080") and hz[18:].startswith("0101000080")

    # nested multi inside a collection
    gc2 = write_collection([write_multipoint([(5.0, 6.0)])])
    assert ewkb_hex(gc2, srid=0, dim=2) == (
        "010700000001000000"
        "010400000001000000"
        "010100000000000000000014400000000000001840")


def test_ewkb_hex_nested_collection_and_z_children():
    """Review findings: nested GEOMETRYCOLLECTION recursion, and
    _geom_length on Z-typed children inside a collection."""
    from gdal_spark.functions import wkb as W

    nested = W.write_collection([
        W.write_collection([W.write_point(1.0, 2.0)]),
        W.write_multipoint([(3.0, 4.0)]),
    ])
    h = ewkb_hex(nested, srid=0, dim=2)
    assert h == (
        "010700000002000000"
        "010700000001000000"
        "0101000000000000000000F03F0000000000000040"
        "010400000001000000"
        "010100000000000000000008400000000000001040")

    zc = W.write_collection([W.write_point_z(1.0, 2.0, 3.0)])
    gtype, payload = W.parse(zc)
    assert gtype == 7 and payload[0][0] == 1001
