"""MiraMon raster driver vs the reference autotest
(autotest/gdrivers/miramon_read.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.miramon import miramon_open

D = "/root/reference/autotest/gdrivers/data/miramon"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)

GT = (516792.0, 2.0, 0.0, 4638260.0, 0.0, -2.0)

NORMAL = [
    "byte_2x3_6_categs.img", "byte_2x3_6_categsI.rel",
    "integer_2x3_6_categs.img", "integer_2x3_6_categsI.rel",
    "uinteger_2x3_6_categs.img", "uinteger_2x3_6_categsI.rel",
    "long_2x3_6_categs.img", "long_2x3_6_categsI.rel",
    "real_2x3_6_categs.img", "real_2x3_6_categsI.rel",
    "double_2x3_6_categs.img", "double_2x3_6_categsI.rel",
    "byte_2x3_6_categs_RLE.img", "byte_2x3_6_categs_RLEI.rel",
    "byte_2x3_6_categs_RLE_no_ind.img", "byte_2x3_6_categs_RLE_no_indI.rel",
    "integer_2x3_6_categs_RLE.img", "integer_2x3_6_categs_RLEI.rel",
    "uinteger_2x3_6_categs_RLE.img", "uinteger_2x3_6_categs_RLEI.rel",
    "long_2x3_6_categs_RLE.img", "long_2x3_6_categs_RLEI.rel",
    "real_2x3_6_categs_RLE.img", "real_2x3_6_categs_RLEI.rel",
    "double_2x3_6_categs_RLE.img", "double_2x3_6_categs_RLEI.rel",
]


@pytest.mark.parametrize("name", NORMAL,
                         ids=[n.split(".")[0] for n in NORMAL])
def test_miramon_basic(name):
    """test_miramon_test_basic_raster: all six dtypes, raw + RLE
    (indexed and non-indexed), both .img and I.rel entry points;
    values 0..5, checksum 15, min 0, max 5, the UTM gt."""
    ds = miramon_open(os.path.join(D, "normal", name))
    b = ds.bands[0]
    a = b.read()
    assert list(a.astype(float).ravel()) == [0, 1, 2, 3, 4, 5]
    assert checksum(a) == 15
    assert (b.minimum, b.maximum) == (0, 5)
    assert b.geotransform == GT


def test_miramon_bit():
    """chess_bit: LSB-first bit expansion, default 0..cols/rows gt."""
    ds = miramon_open(os.path.join(D, "normal", "chess_bit.img"))
    b = ds.bands[0]
    a = b.read()
    assert list(a.ravel()[:16]) == [0, 1, 0, 1, 0, 1, 0, 1,
                                    1, 0, 1, 0, 1, 0, 1, 0]
    assert checksum(a) == 32
    assert b.geotransform == (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)


def test_miramon_all_nodata():
    ds = miramon_open(os.path.join(D, "all_nodata", "nodataI.rel"))
    b = ds.bands[0]
    a = b.read()
    assert list(a.astype(float).ravel()) == [0.0] * 6
    assert checksum(a) == 0
    assert b.minimum is None and b.maximum is None


def test_miramon_subdatasets():
    """test_miramon_subdatasets_detection / _number: 5 subdatasets for
    the multiband rel (bands differ in nodata/extent), reachable from
    the .img too; 10 for the subdatasets fixture (byte + byte-RLE group
    because compatibility compares the uncompressed data type)."""
    rel = os.path.join(D, "multiband", "byte_2x3_6_multibandI.rel")
    ds = miramon_open(rel)
    assert len(ds.subdatasets) == 5
    ds2 = miramon_open(os.path.join(D, "multiband", "byte_2x3_6_categs.img"))
    assert len(ds2.subdatasets) == 5

    # subdataset 1: plain 0..5
    sub = miramon_open(ds.subdatasets[0][0])
    b = sub.bands[0]
    assert list(b.read().astype(float).ravel()) == [0, 1, 2, 3, 4, 5]
    assert b.nodata is None and (b.minimum, b.maximum) == (0, 5)
    # subdataset 2: nodata 255
    sub = miramon_open(ds.subdatasets[1][0])
    b = sub.bands[0]
    assert list(b.read().astype(float).ravel()) == [0, 1, 2, 3, 4, 255]
    assert b.nodata == 255 and (b.minimum, b.maximum) == (0, 4)
    # subdataset 3: nodata 0, min 1
    sub = miramon_open(ds.subdatasets[2][0])
    b = sub.bands[0]
    assert list(b.read().astype(float).ravel()) == [0, 1, 2, 3, 4, 5]
    assert b.nodata == 0 and (b.minimum, b.maximum) == (1, 5)

    ds3 = miramon_open(os.path.join(D, "subdatasets", "byteI.rel"))
    assert len(ds3.subdatasets) == 10


@pytest.mark.parametrize("name,msg", [
    ("alone_rel.rel", "not recognized"),
    ("alone_IrelI.rel", "must have VersMetaDades>=4"),
    ("empy_img.img", "not recognized"),
    ("empy_relI.rel", "must be REL4"),
    ("no_assoc_img.rel", "not recognized"),
    ("no_assoc_rel.img", "not recognized"),
    ("no_colI.rel", "No number of columns documented"),
    ("no_rowI.rel", "No number of rows documented"),
    ("no_zero_col_rowI.rel", "(nWidth <= 0 || nHeight <= 0)"),
    ("no_bandsI.rel", "ATTRIBUTE_DATA-IndexsNomsCamps section-key should exist"),
    ("no_bands2I.rel", "zero usable bands"),
    ("no_bands3I.rel", "ATTRIBUTE_DATA-IndexsNomsCamps section-key should exist"),
    ("no_typeI.rel", "no nDataType documented"),
    ("wrong_typeI.rel", "data type unhandled"),
    ("wrong_band_nameI.rel", "Failed to open MiraMon band file"),
])
def test_miramon_errors(name, msg):
    """test_miramon_test_fails: reference error-message parity."""
    with pytest.raises(Exception) as e:
        miramon_open(os.path.join(D, "several_errors", name))
    assert msg in str(e.value)


def test_miramon_identify():
    from gdal_spark.sources.identify import identify_driver

    p = os.path.join(D, "normal", "byte_2x3_6_categsI.rel")
    assert identify_driver(open(p, "rb").read(1024), p) == "MiraMonRaster"


CT_CASES = [
    ("normal/byte_2x3_6_categsI.rel",
     {0: (0, 0, 255, 255), 1: (0, 255, 255, 255), 2: (0, 255, 0, 255),
      3: (255, 255, 0, 255), 4: (255, 0, 0, 255), 5: (255, 0, 255, 255)}),
    ("palettes/Constant/byte_2x3_6_categsI.rel",
     {0: (255, 0, 255, 255), 1: (255, 0, 255, 255), 2: (255, 0, 255, 255),
      3: (255, 0, 255, 255), 4: (255, 0, 255, 255), 5: (0, 0, 0, 0)}),
    ("palettes/Constant/real_2x3_6_categsI.rel",
     {0: (255, 0, 255, 255), 5: (0, 0, 0, 0)}),
    ("palettes/Categorical/Assigned/byte_2x3_6_categsI.rel",
     {0: (0, 0, 125, 255), 1: (0, 134, 255, 255), 2: (0, 255, 0, 255),
      3: (255, 255, 78, 255), 4: (255, 0, 0, 255), 5: (255, 0, 133, 255)}),
    ("palettes/Continous/ColorTable/directassignement/byte_2x3_6_categsI.rel",
     {0: (0, 0, 125, 255), 5: (255, 0, 133, 255)}),
    ("palettes/Continous/ColorTable/directassignement/uinteger_with_nodataI.rel",
     {0: (0, 0, 125, 255), 5: (255, 0, 133, 255)}),
    ("palettes/Continous/ColorTable/lineal/byte_2x3_6_categsI.rel",
     {0: (0, 0, 125, 255), 5: (255, 0, 133, 255)}),
    ("palettes/Continous/ColorTable/lineal_rare/byte_2x3_6_categsI.rel",
     {0: (0, 0, 125, 255), 1: (0, 134, 255, 255), 2: (0, 255, 0, 255),
      3: (255, 255, 78, 255), 4: (255, 0, 0, 255), 5: (255, 0, 133, 255),
      255: (255, 255, 255, 255)}),
    ("palettes/Categorical/Assigned/real_2x3_6_categsI.rel",
     {0: (0, 0, 125, 255), 5: (255, 0, 133, 255)}),
    ("palettes/Categorical/Assignedp25/byte_2x3_6_categsI.rel",
     {0: (0, 0, 0, 255), 1: (0, 97, 0, 255), 2: (0, 162, 0, 255),
      3: (0, 255, 0, 255), 4: (255, 255, 0, 255), 5: (255, 210, 0, 255),
      15: (255, 178, 255, 255)}),
    ("palettes/Categorical/AssignedPAL/byte_2x3_6_categsI.rel",
     {0: (0, 0, 0, 255), 1: (0, 24, 0, 255), 2: (0, 40, 0, 255),
      3: (0, 63, 0, 255), 4: (63, 63, 0, 255), 5: (63, 52, 0, 255),
      15: (63, 44, 63, 255)}),
    ("palettes/Categorical/Assignedp65/byte_2x3_6_categsI.rel",
     {0: (0, 0, 0, 255), 5: (63, 52, 0, 255), 15: (63, 44, 63, 255)}),
    ("palettes/Categorical/ThematicNoDataBeg/MUCSC_2002_30_m_v_6_retI.rel",
     {0: (0, 0, 0, 0), 1: (212, 247, 255, 255), 2: (153, 247, 245, 255),
      8: (255, 255, 201, 255), 9: (184, 201, 189, 255),
      14: (145, 108, 0, 255), 15: (83, 166, 0, 255), 16: (149, 206, 0, 255),
      20: (65, 206, 0, 255), 21: (128, 0, 128, 255),
      24: (201, 232, 163, 255)}),
]


@pytest.mark.parametrize("path,expected", CT_CASES,
                         ids=[c[0].split("/")[-2] + "_" +
                              c[0].split("/")[-1].split(".")[0]
                              for c in CT_CASES])
def test_miramon_color_tables(path, expected):
    """test_miramon_epsg_and_color_table: thematic automatic palette,
    constant colour, DBF / PAL / P25 / P65 palettes, categorical direct
    assignment and continuous direct/linear scaling with nodata slots."""
    ds = miramon_open(os.path.join(D, path))
    ct = ds.bands[0].color_table()
    assert ct is not None
    for idx, color in expected.items():
        assert ct.get(idx) == color, (idx, ct.get(idx), color)


def test_miramon_wrong_palettes_no_crash():
    """The WrongPalette/NonExistant/Empty fixtures must not raise when
    asking for the colour table."""
    for name in ("WrongPaletteI.rel", "WrongPalette2I.rel",
                 "WrongPalette3I.rel", "NonExistantPaletteI.rel",
                 "EmptyPaletteI.rel"):
        ds = miramon_open(os.path.join(D, "several_errors", name))
        ds.bands[0].color_table()  # may be None; must not raise


RAT_CASES = [
    ("palettes/Continous/DBF_nodata_end/double_with_nodataI.rel",
     {(0, "MIN"): 1.7e308, (0, "Red"): 204, (0, "Green"): 217,
      (2, "MIN"): -2130706431.0078125, (2, "MAX"): -2113929215.015625,
      (2, "Red"): 144, (52, "MIN"): -1291845631.398438,
      (52, "Red"): 192, (255, "MIN"): 2113929215.015625,
      (255, "MAX"): 2147483647, (255, "Red"): 164,
      (256, "MIN"): 2147483647, (256, "MAX"): 2147483647}),
    ("palettes/Continous/ColorTable/uinteger_with_nodataI.rel",
     {(0, "MIN"): 65535, (0, "Red"): 204, (1, "MIN"): 0, (1, "MAX"): 256,
      (1, "Red"): 149, (52, "MIN"): 13056, (52, "MAX"): 13312,
      (255, "MIN"): 65023, (255, "MAX"): 65534, (256, "MIN"): 65534}),
    ("palettes/Constant/integer_2x3_6_categsI.rel",
     {(0, "MIN"): -32768, (0, "Red"): 0, (0, "Green"): 0, (0, "Blue"): 0,
      (1, "MIN"): 0, (1, "MAX"): 5, (1, "Red"): 255, (1, "Green"): 0,
      (1, "Blue"): 255}),
    ("palettes/Continous/LinearLogSimbo/LinearSimboWith0I.rel",
     {(0, "MIN"): 0, (0, "MAX"): 1000000, (0, "Red"): 81,
      (1, "MIN"): 1000000, (1, "MAX"): 2000000, (7, "MIN"): 7000000,
      (7, "MAX"): 8000000, (7, "Red"): 255, (9, "MIN"): 10000000,
      (9, "MAX"): 10000000, (9, "Red"): 255}),
    ("palettes/Categorical/Assigned/double_2x3_6I.rel",
     {(0, "MIN_MAX"): 0, (0, "Red"): 0, (0, "Blue"): 125,
      (1, "MIN_MAX"): 1, (1, "Green"): 134, (5, "MIN_MAX"): 5,
      (5, "Red"): 255, (5, "Blue"): 133}),
]


@pytest.mark.parametrize("path,expected", RAT_CASES,
                         ids=[c[0].split("/")[-2] + "_" +
                              c[0].split("/")[-1].split(".")[0]
                              for c in RAT_CASES])
def test_miramon_rat_from_palette(path, expected):
    """test_miramon_default_rat: the palette-derived attribute tables
    (constant / direct-assignation / linear interval scaling)."""
    rat = miramon_open(os.path.join(D, path)).bands[0].default_rat()
    assert rat is not None
    cols, rows = rat["columns"], rat["rows"]
    for (r, c), want in expected.items():
        got = rows[r][cols.index(c)]
        assert got == pytest.approx(want, rel=1e-9), (r, c, got, want)


@pytest.mark.parametrize("sub", [
    "ThematicNoDataBeg", "ThematicNoDataEnd", "ThematicNoREL",
    "ThematicNoDataMiddle", "ThematicLessColors",
])
def test_miramon_rat_from_dbf(sub):
    """DBF attribute tables: rows are indexed by the category value,
    logical fields stay raw T/F strings."""
    rat = miramon_open(os.path.join(
        D, "palettes", "Categorical", sub, "MUCSC_2002_30_m_v_6_retI.rel"
    )).bands[0].default_rat()
    assert rat is not None and rat["thematic"]
    cols, rows = rat["columns"], rat["rows"]

    def v(r, c):
        return rows[r][cols.index(c)]

    assert v(1, "CODI_USCOB") == 1
    assert v(1, "DESC_USCOB") == "Aigües marines"
    assert v(1, "CAMPEXTRA1") == "extra1"
    assert v(1, "CAMPEXTRA2") == 2
    assert v(1, "CAMPEXTRA3") == "20250110"
    assert v(1, "CAMPEXTRA4") == "T"
    assert v(2, "CODI_USCOB") == 2
    assert v(2, "DESC_USCOB") == "Aigües continentals"
    assert v(2, "CAMPEXTRA4") == "F"


def test_miramon_rat_none_for_all_nodata():
    assert miramon_open(
        os.path.join(D, "all_nodata", "nodataI.rel")
    ).bands[0].default_rat() is None
