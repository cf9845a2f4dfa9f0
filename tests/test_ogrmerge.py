"""ogrmerge parity (autotest/pyscripts/test_ogrmerge.py tests 1-7c) over
the reference's own poly.shp / testpoly.shp fixtures."""

import pytest

from gdal_spark.operators.ogrmerge import layer_geom_type, ogrmerge, subst_pattern

POLY = "/root/reference/autotest/ogr/data/poly.shp"
TESTPOLY = "/root/reference/autotest/ogr/data/shp/testpoly.shp"


@pytest.fixture(scope="module")
def poly(spark):
    from gdal_spark.sources.vector_formats import read_shapefile

    return read_shapefile(spark, POLY)


@pytest.fixture(scope="module")
def testpoly(spark):
    from gdal_spark.sources.vector_formats import read_shapefile

    return read_shapefile(spark, TESTPOLY)


def test_ogrmerge_single_two_inputs(poly):
    """test_ogrmerge_1: -single over poly.shp twice -> 20 features."""
    out = ogrmerge([(POLY, "poly", poly), (POLY, "poly", poly)], single=True)
    assert len(out) == 1
    assert out[0][1].count() == 20


def test_ogrmerge_nln_pattern(poly, testpoly):
    """test_ogrmerge_5: layer-name pattern substitution."""
    out = ogrmerge(
        [(POLY, "poly", poly), (TESTPOLY, "testpoly", testpoly)],
        nln="foo_{DS_NAME}_{DS_BASENAME}_{DS_INDEX}_{LAYER_NAME}_{LAYER_INDEX}",
    )
    assert out[0][0] == f"foo_{POLY}_poly_0_poly_0"
    assert out[0][1].count() == 10
    assert out[1][0] == f"foo_{TESTPOLY}_testpoly_1_testpoly_0"
    assert out[1][1].count() == 14


def test_ogrmerge_src_layer_field(poly):
    """test_ogrmerge_6: per-feature source field content."""
    out = ogrmerge(
        [(POLY, "poly", poly)],
        single=True,
        src_layer_field_name="source",
        src_layer_field_content=(
            "foo_{DS_NAME}_{DS_BASENAME}_{DS_INDEX}_{LAYER_NAME}_{LAYER_INDEX}"
        ),
    )
    row = out[0][1].select("source").first()
    assert row.source == f"foo_{POLY}_poly_0_poly_0"


def test_ogrmerge_src_geom_type(poly):
    """test_ogrmerge_7/7a: POINT excludes poly.shp, POLYGON keeps it."""
    assert layer_geom_type(poly) == "POLYGON"
    out = ogrmerge([(POLY, "poly", poly)], single=True, src_geom_type="POINT")
    assert out == []
    out = ogrmerge([(POLY, "poly", poly)], single=True, src_geom_type="POLYGON")
    assert len(out) == 1
    assert out[0][1].count() == 10


def test_ogrmerge_field_reconcile(spark, poly):
    """-single union reconciles differing schemas by name (missing
    fields null)."""
    extra = poly.withColumn("extra", poly["fid"] * 2)
    out = ogrmerge(
        [(POLY, "poly", poly), (POLY + "2", "poly", extra)], single=True
    )
    df = out[0][1]
    assert df.count() == 20
    assert "extra" in df.columns
    assert df.filter(df["extra"].isNull()).count() == 10


def test_subst_pattern_basename():
    assert (
        subst_pattern("{DS_BASENAME}|{DS_INDEX}|{LAYER_INDEX}", "/a/b/poly.shp", 3, "x", 7)
        == "poly|3|7"
    )
