"""VDV/IDF driver vs the reference autotest (autotest/ogr/ogr_vdv.py)."""

import os

import pytest

from gdal_spark.sources.vdv import idf_layers, vdv_parse, vdv_write

VD = "/root/reference/autotest/ogr/data/vdv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VD), reason="reference autotest data not present"
)


def _read(name):
    with open(os.path.join(VD, name), "rb") as fh:
        return fh.read()


def test_idf_1():
    layers = idf_layers(_read("test.idf"))
    names = list(layers)
    assert names[:3] == ["Node", "Link", "LinkCoordinate"]
    f = layers["Node"][0]
    assert f["NODE_ID"] == 1
    assert f["foo"] == "U"
    assert f["wkt"] == "POINT (2 49)"
    f = layers["Link"][0]
    assert f["wkt"] == "LINESTRING (2 49,2.5 49.5,2.7 49.7,3 50)"
    f = layers["LinkCoordinate"][0]
    assert f["wkt"] == "POINT (2.5 49.5)"
    f = layers[names[3]][0]
    assert f["FOO"] == 1


def test_idf_3d():
    layers = idf_layers(_read("test_3d.idf"))
    assert layers["Node"][0]["wkt"] == "POINT (2 49 10)"
    assert layers["Link"][0]["wkt"] == \
        "LINESTRING (2 49 10,2.5 49.5 10,2.7 49.7 20,3 50 20)"
    assert layers["LinkCoordinate"][0]["wkt"] == "POINT (2.5 49.5 10)"


# writer golden from autotest test_ogr_vdv_2
GOLDEN_VDV_2 = """mod; DD.MM.YYYY; HH:MM:SS; free
src; "UNKNOWN"; "01.01.1970"; "00.00.00"
chs; "ISO8859-1"
ver; "1.4"
ifv; "1.4"
dve; "1.4"
fft; ""
foo; "bar"
tbl; another_layer
atr; str_field
frm; char[80]
rec; "0"
rec; "1"
rec; "2"
rec; "3"
rec; "4"
end; 5
tbl; lyr_1
atr; str_field; int_field; int64_field; bool_field; str2_field; int2_field
frm; char[80]; num[10.0]; num[19.0]; boolean; char[2]; num[1.0]
rec; "a""b"; 12; NULL; 1; NULL; NULL
rec; NULL; NULL; NULL; NULL; NULL; NULL
end; 2
tbl; empty
atr;
frm;
end; 0
tbl; empty2
atr;
frm;
end; 0
eof; 4
"""


def test_vdv_2_writer_golden():
    layers = {
        "another_layer": {
            "fields": [("str_field", "string")],
            "rows": [{"str_field": str(i)} for i in range(5)],
        },
        "lyr_1": {
            "fields": [("str_field", "string"), ("int_field", "integer"),
                       ("int64_field", "integer64"),
                       ("bool_field", "boolean"),
                       ("str2_field", "string", 2),
                       ("int2_field", "integer", 2)],
            "rows": [{"str_field": 'a"b', "int_field": 12, "bool_field": 1},
                     {}],
        },
        "empty": {"fields": [], "rows": []},
        "empty2": {"fields": [], "rows": []},
    }
    out = vdv_write(layers, extra_header={"foo": "bar"})
    assert out == GOLDEN_VDV_2


def test_vdv_roundtrip():
    tables, header = vdv_parse(GOLDEN_VDV_2)
    assert header["foo"] == "bar"
    assert list(tables) == ["another_layer", "lyr_1", "empty", "empty2"]
    rows = tables["lyr_1"]["rows"]
    assert rows[0]["str_field"] == 'a"b'
    assert rows[0]["int_field"] == 12
    assert rows[0]["int64_field"] is None
    assert rows[0]["bool_field"] == 1
    assert rows[1]["str_field"] is None
    assert [r["str_field"] for r in tables["another_layer"]["rows"]] == \
        ["0", "1", "2", "3", "4"]
