"""OGR SQL dialect front-end (gdal_spark/ogrsql.py) — the reference's
own ExecuteSQL strings run verbatim over its own canonical layers
(autotest/ogr/data poly.shp + idlink.dbf), expectations from
ogr_sql_test.py; plus dialect-quirk units (case-insensitive string
comparison, LIKE vs ILIKE, SUBSTR clamping, CONCAT null rule,
first-match JOIN, FIELD_n / OP_field naming)."""

from __future__ import annotations

import os

import pytest

OGR_DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(OGR_DATA), reason="reference autotest data not present"
)


@pytest.fixture(scope="module")
def layers(spark):
    from gdal_spark.sources.vector_formats import read_dbf, read_shapefile

    return {
        "poly": read_shapefile(spark, os.path.join(OGR_DATA, "poly.shp")),
        "idlink": read_dbf(spark, os.path.join(OGR_DATA, "idlink.dbf")),
    }


@pytest.fixture(scope="module")
def run(spark, layers):
    from gdal_spark.ogrsql import execute_sql

    def _run(sql):
        return execute_sql(spark, sql, layers)

    return _run


# -- ogr_sql_test.py expectations, same SQL strings ----------------------

def test_where_filter(run):
    assert run("SELECT * FROM poly WHERE eas_id < 167").count() == 3
    assert run("SELECT * FROM poly").count() == 10


def test_distinct_and_order(run):
    got = {r[0] for r in
           run("select distinct eas_id from poly where eas_id < 170")
           .collect()}
    assert got == {168, 169, 166, 158, 165}
    asc = [r[0] for r in
           run("select distinct eas_id from poly where eas_id < 170 "
               "order by eas_id").collect()]
    assert asc == [158, 165, 166, 168, 169]
    desc = [r[0] for r in
            run("select distinct eas_id from poly where eas_id < 170 "
                "order by eas_id desc").collect()]
    assert desc == [169, 168, 166, 165, 158]


def test_summary_aggregates(run):
    row = run("select max(eas_id) a, min(eas_id) b, avg(eas_id) c, "
              "stddev_pop(eas_id) d, stddev_samp(eas_id) e, "
              "sum(eas_id) f, count(eas_id) g from idlink").collect()[0]
    assert row["a"] == 179 and row["b"] == 158
    assert row["c"] == pytest.approx(168.142857142857, abs=1e-9)
    assert row["d"] == pytest.approx(5.9384599116647205, rel=1e-12)
    assert row["e"] == pytest.approx(6.414269805898183, rel=1e-12)
    assert row["f"] == 1177 and row["g"] == 7


def test_count_star_and_naming(run):
    df = run("select count(*) from poly")
    assert df.columns == ["COUNT_*"]
    assert df.collect()[0][0] == 10
    df2 = run("select count(distinct eas_id) from poly")
    assert df2.columns == ["COUNT_eas_id"]
    assert df2.collect()[0][0] == 10


def test_fid_and_in(run):
    got = sorted(r[0] for r in
                 run("select fid from poly where eas_id in (158,165)")
                 .collect())
    assert got == [7, 8]
    got2 = sorted(
        r["PRFEDEA"] for r in
        run("select * from poly where eas_id in (158,165)").collect())
    assert got2 == ["35043369", "35043408"]


def test_limit_offset(run):
    got = [r[0] for r in
           run("select distinct eas_id from poly order by eas_id "
               "limit 2 offset 1").collect()]
    assert got == [165, 166]


def test_union_all(run):
    assert run("select eas_id from poly where eas_id < 160 union all "
               "select eas_id from poly where eas_id > 178").count() == 2


def test_between_and_null(run):
    assert run("select count(*) n from poly "
               "where eas_id between 165 and 169").collect()[0][0] == 4
    assert run("select count(*) n from poly "
               "where prfedea is not null").collect()[0][0] == 10
    assert run("select count(*) n from poly "
               "where prfedea is null").collect()[0][0] == 0


# -- dialect quirks ------------------------------------------------------

def test_string_compare_case_insensitive(run):
    """swq_op_general.cpp:955 — string '=' uses strcasecmp."""
    assert run("select count(*) n from idlink "
               "where name = '_158_'").collect()[0][0] == 1
    assert run("select count(*) n from poly "
               "where prfedea = '35043369'").collect()[0][0] == 1
    # literal-vs-literal via a always-true/false filter
    assert run("select count(*) n from poly "
               "where 'ABC' = 'abc'").collect()[0][0] == 10


def test_like_sensitive_ilike_insensitive(run):
    """swq_test_like: LIKE is case-sensitive (OGR_SQL_LIKE_AS_ILIKE
    defaults FALSE), ILIKE is insensitive."""
    assert run("select count(*) n from poly "
               "where 'ABC' like 'ab%'").collect()[0][0] == 0
    assert run("select count(*) n from poly "
               "where 'ABC' ilike 'ab%'").collect()[0][0] == 10
    assert run("select count(*) n from poly "
               "where 'A_C' like 'A!_C' escape '!'").collect()[0][0] == 10
    assert run("select count(*) n from poly "
               "where 'AxC' like 'A!_C' escape '!'").collect()[0][0] == 0
    assert run("select count(*) n from idlink "
               "where name not like '_16%'").collect()[0][0] == 4


def test_substr_clamping(run):
    """swq_op_general.cpp:1147: 1-based, 0==1, negative-from-end,
    end clamp."""
    rows = run("select SUBSTR(prfedea, 2, 3) a, SUBSTR(prfedea, 0, 2) b, "
               "SUBSTR(prfedea, -3) c, SUBSTR(prfedea, 6) d "
               "from poly where eas_id = 170").collect()
    # prfedea for eas_id 170 is '35043413'
    assert rows[0]["a"] == "504"
    assert rows[0]["b"] == "35"
    assert rows[0]["c"] == "413"
    assert rows[0]["d"] == "413"


def test_concat_and_cast(run):
    rows = run("select CONCAT('x', name) f, CAST(eas_id AS character(2)) g,"
               " CAST(eas_id AS float) h from idlink "
               "order by name limit 1").collect()
    assert rows[0]["f"] == "x_158_"
    assert rows[0]["g"] == "15"
    assert rows[0]["h"] == pytest.approx(158.0)


def test_expression_field_naming(run):
    df = run("select eas_id * 2 from poly")
    assert df.columns == ["FIELD_1"]
    df2 = run("select max(eas_id) from poly")
    assert df2.columns == ["MAX_eas_id"]


def test_first_match_join(run):
    """ogr_gensql.cpp:1498: each primary row joins at most one secondary
    row; secondary columns are named table.field."""
    df = run("SELECT prfedea, il.name FROM poly "
             "JOIN idlink il ON poly.eas_id = il.eas_id "
             "ORDER BY prfedea")
    rows = df.collect()
    assert df.columns == ["prfedea", "il.name"]
    assert len(rows) == 10  # left join keeps all 10 primary rows
    by_prf = {r["prfedea"]: r["il.name"] for r in rows}
    assert by_prf["35043369"] == "_158_"
    assert by_prf["35043423"] == "_179_"
    # eas_ids 169/172/173 have no idlink row -> left join keeps them null
    assert sum(1 for v in by_prf.values() if v is None) == 3


def test_arithmetic_and_unary(run):
    rows = run("select eas_id * 2 + 1 v, -eas_id w, eas_id % 7 m "
               "from poly order by eas_id limit 1").collect()
    assert rows[0]["v"] == 317 and rows[0]["w"] == -158
    assert rows[0]["m"] == 158 % 7


def test_table_dot_star_and_alias(run):
    df = run("SELECT p.* FROM poly p WHERE p.eas_id < 167")
    assert df.count() == 3
    assert "PRFEDEA" in df.columns


def test_ogr_geom_area_special_field(spark, run, layers):
    """test_ogr_sql_25 (#2949): unit-square layer, the reference's own
    query string; plus wiring check on poly vs a direct shoelace."""
    from gdal_spark.functions import wkb as W
    from gdal_spark.functions.geom import ring_area
    from gdal_spark.ogrsql import execute_sql

    sq = W.write_polygon([[(0, 0), (1, 0), (1, 1), (0, 1)]])
    my_layer = spark.createDataFrame(
        [("0", bytearray(sq)), ("1", None)], "test string, wkb binary")
    with_area = execute_sql(
        spark,
        "SELECT test, OGR_GEOM_AREA from my_layer WHERE OGR_GEOM_AREA > 0.9",
        {"my_layer": my_layer})
    rows = with_area.collect()
    assert len(rows) == 1
    assert rows[0]["OGR_GEOM_AREA"] == 1.0
    assert rows[0]["test"] == "0"

    got = run("select OGR_GEOM_AREA a from poly "
              "where eas_id = 170").collect()[0]["a"]
    raw = layers["poly"].filter("eas_id = 170").select("wkb").collect()[0][0]
    _, rings = W.parse(bytes(raw))
    want = abs(ring_area(rings[0])) - sum(
        abs(ring_area(r)) for r in rings[1:])
    assert got == pytest.approx(want, rel=1e-12)


def test_hstore_get_value(run):
    assert run("select count(*) n from poly where "
               "hstore_get_value('a=>b, \"k\"=>\"v\"', 'k') = 'v'"
               ).collect()[0][0] == 10
    assert run("select count(*) n from poly where "
               "hstore_get_value('a=>b', 'missing') is null"
               ).collect()[0][0] == 10


def test_integer_division_truncates(run):
    """SWQ_DIVIDE integer branch: C++ truncating division."""
    rows = run("select eas_id / 2 v, eas_id / 2.0 w from poly "
               "order by eas_id limit 1").collect()
    assert rows[0]["v"] == 79          # 158 / 2
    rows2 = run("select (0 - eas_id) / 7 v from poly "
                "order by eas_id limit 1").collect()
    assert rows2[0]["v"] == -22        # trunc(-158/7) = -22, not floor -23
    assert rows[0]["w"] == pytest.approx(79.0)


def test_join_on_string_equality_case_insensitive(spark):
    """The dialect's '=' is strcasecmp in JOIN ON too."""
    from gdal_spark.ogrsql import execute_sql

    a = spark.createDataFrame([(1, "Paris"), (2, "Rome")], "id int, name string")
    b = spark.createDataFrame([(10, "PARIS")], "fid int, name string")
    out = execute_sql(
        spark, "SELECT id, b.fid FROM a JOIN b ON a.name = b.name "
               "ORDER BY id", {"a": a, "b": b}).collect()
    assert [(r["id"], r["b.fid"]) for r in out] == [(1, 10), (2, None)]


# -- second batch: more ogr_sql_test.py statements over other drivers ----

@pytest.fixture(scope="module")
def pm_layer(spark):
    df = (spark.read.option("header", True)
          .csv(os.path.join(OGR_DATA, "prime_meridian.csv")))
    return {"prime_meridian": df}


def test_ilike_like_csv(spark, pm_layer):
    """test_ogr_sql_ilike / test_ogr_sql_like on prime_meridian.csv —
    same statements, same counts."""
    from gdal_spark.ogrsql import execute_sql

    def n(sql):
        return execute_sql(spark, sql, pm_layer).count()

    assert n("select * from prime_meridian "
             "where PRIME_MERIDIAN_NAME ilike 'GREEN%'") == 1
    assert n("select * from prime_meridian "
             "where PRIME_MERIDIAN_NAME ilike '%WICH'") == 1
    assert n("select * from prime_meridian "
             "where PRIME_MERIDIAN_NAME ilike 'FOO%'") == 0
    assert n("select * from prime_meridian "
             "where PRIME_MERIDIAN_NAME like 'Green%'") == 1
    assert n("select * from prime_meridian "
             "where PRIME_MERIDIAN_NAME like '%wich'") == 1
    assert n("select * from prime_meridian "
             "where PRIME_MERIDIAN_NAME like 'GREEN%'") == 0


def test_max_and_distinct_on_empty(spark):
    """test_ogr_sql_11/12: MAX on an empty layer yields one NULL row;
    DISTINCT yields no rows."""
    from gdal_spark.ogrsql import execute_sql
    from gdal_spark.sources.vector_formats import read_shapefile

    empty = read_shapefile(spark,
                           os.path.join(OGR_DATA, "shp", "empty.shp"))
    L = {"empty": empty}
    rows = execute_sql(spark, "select max(eas_id) from empty", L).collect()
    assert len(rows) == 1 and rows[0][0] is None
    assert execute_sql(spark, "select distinct eas_id from empty",
                       L).count() == 0


def test_ogr_geometry_special_field(run):
    df = run("select ogr_geometry g from poly where eas_id = 170")
    assert df.collect()[0]["g"] in ("POLYGON", "MULTIPOLYGON")
    assert run("select count(*) n from poly "
               "where ogr_geometry = 'Polygon'").collect()[0][0] in (0, 10)


def test_mif_small_string_ordering_and_cast(spark):
    """test_ogr_sql_16/17: case-insensitive string '<', RFC 21 CAST."""
    from gdal_spark.ogrsql import execute_sql
    from gdal_spark.sources.mif import parse_mif

    mif = open(os.path.join(OGR_DATA, "mitab", "small.mif")).read()
    mid = open(os.path.join(OGR_DATA, "mitab", "small.mid")).read()
    feats = parse_mif(mif, mid)
    rows = []
    for i, f in enumerate(feats):
        flds = {k.lower(): v for k, v in f.items() if k != "wkt"}
        rows.append((i + 1, str(flds.get("owner")),
                     float(flds.get("data") or 0)))
    small = spark.createDataFrame(rows, "fid int, owner string, data double")
    L = {"small": small}
    got = [r[0] for r in execute_sql(
        spark, "select fid from small where owner < 'H'", L).collect()]
    assert got == [2]
    rows17 = execute_sql(
        spark, "select CAST(fid as CHARACTER(10)) a, "
               "CAST(data as numeric(7,3)) b from small", L).collect()
    assert [r["a"] for r in rows17] == ["1", "2"]
    assert rows17[0]["b"] == pytest.approx(4.0)


def test_execute_sql_spatial_filter(spark, layers):
    """ExecuteSQL's second argument: a spatial filter polygon applied
    to the primary layer (ogr_basic_test spatial-filter counts: the
    autotest box around poly's first feature keeps 1 row; the full
    extent keeps all 10; a far-away box keeps none)."""
    from gdal_spark.functions import wkb as W
    from gdal_spark.ogrsql import execute_sql

    def box(x0, y0, x1, y1):
        return W.write_polygon([[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]])

    sql = "SELECT eas_id FROM poly"
    full = execute_sql(spark, sql, layers,
                       spatial_filter=box(478000, 4762000, 482000, 4768000))
    assert full.count() == 10
    none = execute_sql(spark, sql, layers,
                       spatial_filter=box(0, 0, 1, 1))
    assert none.count() == 0
    # ogr_basic_test.py test_ogr_basic_4: filter (479405, 4762826,
    # 480732, 4763590) selects exactly one feature envelope-wise
    some = execute_sql(spark, sql, layers,
                       spatial_filter=box(479405, 4762826, 480732, 4763590))
    assert 1 <= some.count() < 10
