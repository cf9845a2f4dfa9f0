"""gdal_calc parity: autotest/pyscripts/test_gdal_calc.py expectations
reproduced through gdal_spark.raster.calc on the reference's own
stefan_full_rgba.tif / byte.tif, plus the distributed calc_tiles form
and the eval-safety whitelist."""

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.functions.tiff import tiff_decode
from gdal_spark.raster.calc import calc_eval, gdal_calc

GDR = "/root/reference/autotest/gcore/data"


def _cs(a):
    return int(checksum(a))


@pytest.fixture(scope="module")
def stefan():
    with open(os.path.join(GDR, "stefan_full_rgba.tif"), "rb") as fh:
        return tiff_decode(fh.read())


INPUT_CS = (12603, 58561, 36064, 10807)


def test_calc_copy_bands(stefan):
    """tests 1/1b/5d: band copies, multiple calcs -> multi-band"""
    out, _ = gdal_calc("A", {"A": stefan})
    assert _cs(out[:, :, 0]) == INPUT_CS[0]
    out, _ = gdal_calc("A", {"A": stefan}, bands={"A": 2})
    assert _cs(out[:, :, 0]) == INPUT_CS[1]
    out, _ = gdal_calc(["A", "Z"], {"A": stefan, "Z": stefan}, bands={"Z": 2})
    assert [_cs(out[:, :, b]) for b in range(2)] == [INPUT_CS[0], INPUT_CS[1]]


def test_calc_formulas(stefan):
    """tests 2a/2b/2c: A+B wraps on native uint8, A*B, sqrt as Float32"""
    out, _ = gdal_calc("A+B", {"A": stefan, "B": stefan}, bands={"B": 2})
    assert _cs(out[:, :, 0]) == 12368
    out, _ = gdal_calc("A*B", {"A": stefan, "B": stefan}, bands={"B": 2})
    assert _cs(out[:, :, 0]) == 62785
    out, _ = gdal_calc("sqrt(A)", {"A": stefan}, out_type=np.float32)
    assert out.dtype == np.float32
    assert _cs(out[:, :, 0]) == 47132


def test_calc_allbands(stefan):
    """tests 3/4a/4b: --allBands against fixed-band second input"""
    out, _ = gdal_calc("A", {"A": stefan}, all_bands="A")
    assert [_cs(out[:, :, b]) for b in range(4)] == list(INPUT_CS)

    ones, _ = gdal_calc("1", {"A": stefan})
    assert ones.dtype == np.uint8 and int(ones[0, 0, 0]) == 1
    out, ndv = gdal_calc(
        "A+B", {"A": stefan, "B": ones[:, :, 0]}, all_bands="A", nodata_value=999
    )
    assert ndv == 999
    assert [_cs(out[:, :, b]) for b in range(3)] == [29935, 13128, 59092]

    out, _ = gdal_calc(
        "A*B", {"A": stefan, "B": stefan}, bands={"B": 1}, all_bands="A",
        nodata_value=999,
    )
    assert [_cs(out[:, :, b]) for b in range(3)] == [10025, 62785, 10621]


def test_calc_allbands_fill():
    """test_gdal_calc_py_allbands: 3 bands * 1 band"""
    i1 = np.dstack([np.full((3, 3), v, np.uint8) for v in (9, 13, 17)])
    i2 = np.dstack([np.full((3, 3), v, np.uint8) for v in (3, 5, 7)])
    out, _ = gdal_calc("A*B", {"A": i1, "B": i2}, bands={"B": 1}, all_bands="A")
    assert out.shape[2] == 3
    assert list(out[0, 0, :]) == [27, 39, 51]


def test_calc_nodata():
    """test 6: input NDV 74 -> output NDV 1, checksum 4673, min/max
    excluding nodata (90, 255)"""
    with open(os.path.join(GDR, "byte.tif"), "rb") as fh:
        b = tiff_decode(fh.read())
    band = b[:, :, 0] if b.ndim == 3 else b
    out, ndv = gdal_calc("A", {"A": band}, nodata={"A": 74}, nodata_value=1)
    assert ndv == 1
    assert _cs(out[:, :, 0]) == 4673
    vals = out[:, :, 0][out[:, :, 0] != 1]
    assert int(vals.min()) == 90 and int(vals.max()) == 255


def test_calc_numpy_namespace(stefan):
    """test_gdal_calc_py_numpy_max_1/2: numpy.max over a tuple and over
    an alpha list (3-D stacked input)"""
    out, _ = gdal_calc(
        "numpy.max((a,b,c),axis=0)",
        {"a": stefan[:, :, 0], "b": stefan[:, :, 1], "c": stefan[:, :, 2]},
    )
    assert _cs(out[:, :, 0]) == 13256
    out, _ = gdal_calc(
        "numpy.max(a,axis=0)",
        {"a": [stefan[:, :, 0], stefan[:, :, 1], stefan[:, :, 2]]},
    )
    assert _cs(out[:, :, 0]) == 13256


def test_calc_default_ndv_and_type_union():
    """NoDataValue default = per-type lookup; out type = input union"""
    a = np.zeros((2, 2), np.uint8)
    b = np.zeros((2, 2), np.int16)
    out, ndv = gdal_calc("A+B", {"A": a, "B": b})
    assert out.dtype == np.int16 and ndv == -32768
    out, ndv = gdal_calc("A", {"A": a}, nodata_value="none")
    assert ndv is None
    out, ndv = gdal_calc("A", {"A": a}, nodata={"A": 0}, hide_nodata=True)
    assert int(out[0, 0, 0]) == 0  # nodata ignored entirely


def test_calc_eval_rejects_escape():
    """the reference evals in a raw namespace; we keep the surface but
    close the code-exec hole"""
    env = {"A": np.zeros((2, 2))}
    for expr in (
        "().__class__.__mro__",
        "numpy.load('x')",
        "__import__('os')",
        "A.__class__",
        "getattr(A, 'x')",
        "numpy.max(A, out=A)",
    ):
        with pytest.raises((ValueError, AttributeError)):
            calc_eval(expr, env)


def test_calc_tiles_distributed(spark):
    """calc_tiles: decode -> eval -> nodata -> encode inside one
    mapInPandas, multi-band output round-trips the codec"""
    import pandas as pd

    from gdal_spark.functions import codecs
    from gdal_spark.functions.tiff import tiff_encode
    from gdal_spark.raster.calc import calc_tiles

    a = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 97
    b = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 7) % 97
    pdf = pd.DataFrame(
        {"image_id": ["t0"], "a_bytes": [tiff_encode(a)], "b_bytes": [tiff_encode(b)]}
    )
    df = spark.createDataFrame(pdf)
    out = calc_tiles(
        df,
        ["A*2 + B", "numpy.maximum(A, B)"],
        letters={"A": "a_bytes", "B": "b_bytes"},
        nodata={"A": 5},
        nodata_value=200,
    ).collect()
    assert len(out) == 1 and out[0].band_count == 2
    arr = codecs.decode_image(bytes(out[0].bytes), out[0].fmt)
    mask = a == 5
    exp0 = np.where(mask, 200, (a * 2 + b) % 256)
    exp1 = np.where(mask, 200, np.maximum(a, b))
    np.testing.assert_array_equal(arr[:, :, 0], exp0)
    np.testing.assert_array_equal(arr[:, :, 1], exp1)
