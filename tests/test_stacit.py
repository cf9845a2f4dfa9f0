"""STACIT driver vs the reference autotest (autotest/gdrivers/stacit.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.sources.stacit import stacit_open

GD = "/root/reference/autotest/gdrivers"
D = os.path.join(GD, "data/stacit")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def test_basic():
    """test_stacit_basic: two pages -> 40x20 mosaic, placement +
    checksum 9239."""
    ds = stacit_open(os.path.join(D, "test.json"), base_dir=GD)
    assert ds.band_count == 1
    assert (ds.width, ds.height) == (40, 20)
    assert ds.srs_name == "NAD27 / UTM zone 11N"
    assert ds.geotransform == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), rel=1e-8)
    assert ds.nodata is None
    assert ds.sources == [
        ("data/byte.tif", (0, 0, 20, 20), (0, 0, 20, 20)),
        ("data/int16.tif", (0, 0, 20, 20), (20, 0, 20, 20)),
    ]
    assert checksum(ds.read()) == 9239


def test_max_items():
    """test_stacit_max_items: MAX_ITEMS=1 keeps page 1 only."""
    ds = stacit_open(os.path.join(D, "test.json"), max_items=1,
                     base_dir=GD)
    assert ds.width == 20
    assert checksum(ds.read()) == 4672


def test_multiple_assets():
    """test_stacit_multiple_assets: subdataset listing + selection."""
    path = os.path.join(D, "test_multiple_assets.json")
    ds = stacit_open(path, base_dir=GD)
    assert ds.band_count == 0
    assert ds.subdatasets == [
        (f'STACIT:"{path}":collection=my_collection,asset=B01,'
         "crs=EPSG_26711",
         f"Collection my_collection, Asset B01 of {path} "
         "in CRS EPSG:26711"),
        (f'STACIT:"{path}":collection=my_collection,asset=B01,'
         "crs=EPSG_26712",
         f"Collection my_collection, Asset B01 of {path} "
         "in CRS EPSG:26712"),
        (f'STACIT:"{path}":collection=my_collection,asset=B02',
         f"Collection my_collection, Asset B02 of {path}"),
        (f'STACIT:"{path}":collection=my_collection2,asset=B01',
         f"Collection my_collection2, Asset B01 of {path}"),
    ]

    ds = stacit_open(ds.subdatasets[0][0], base_dir=GD)
    assert (ds.width, ds.height) == (20, 20)
    assert ds.srs_name == "NAD27 / UTM zone 11N"
    assert ds.geotransform == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), rel=1e-8)

    ds = stacit_open(
        f'STACIT:"{path}":collection=my_collection,asset=B01,'
        "crs=EPSG_26712", base_dir=GD)
    assert ds.srs_name == "NAD27 / UTM zone 12N"

    ds = stacit_open(
        f'STACIT:"{path}":collection=my_collection,asset=B02',
        base_dir=GD)
    assert ds.geotransform == pytest.approx(
        (-440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), rel=1e-8)

    ds = stacit_open(
        f'STACIT:"{path}":collection=my_collection2,asset=B01',
        base_dir=GD)
    assert ds.srs_name == "NAD27 / UTM zone 13N"

    with pytest.raises(ValueError):
        stacit_open(f'STACIT:"{path}":collection=i_dont_exist',
                    base_dir=GD)
    with pytest.raises(ValueError):
        stacit_open(f'STACIT:"{path}":asset=i_dont_exist', base_dir=GD)


def test_overlapping_sources():
    """test_stacit_overlapping_sources: covered sources dropped unless
    USE_ALL."""
    path = os.path.join(D, "overlapping_sources.json")
    for strat in (None, "REMOVE_IF_NO_NODATA", "USE_MOST_RECENT"):
        kw = {} if strat is None else {"overlap_strategy": strat}
        ds = stacit_open(path, base_dir=GD, **kw)
        assert [s[0] for s in ds.sources] == ["data/byte.tif"], strat
        assert ds.color_interp == "Coastal"
    ds = stacit_open(path, base_dir=GD, overlap_strategy="USE_ALL")
    assert len(ds.file_list) == 4


def test_overlapping_sources_with_nodata():
    """test_stacit_overlapping_sources_with_nodata."""
    path = os.path.join(D, "overlapping_sources_with_nodata.json")
    ds = stacit_open(path, base_dir=GD)
    assert ds.nodata == 0
    # draw order: older byte.tif first, newer byte_nodata_0 on top
    assert [s[0] for s in ds.sources] == \
        ["data/byte.tif", "data/byte_nodata_0.tif"]
    assert len(ds.file_list) == 3

    ds = stacit_open(path, base_dir=GD,
                     overlap_strategy="REMOVE_IF_NO_NODATA")
    assert len(ds.file_list) == 3

    ds = stacit_open(path, base_dir=GD,
                     overlap_strategy="USE_MOST_RECENT")
    assert len(ds.file_list) == 2

    ds = stacit_open(path, base_dir=GD, overlap_strategy="USE_ALL")
    assert len(ds.file_list) == 3


def test_stac_11_single_feature():
    """test.json's 1.1 sibling: a bare Feature with proj:code."""
    ds = stacit_open(os.path.join(D, "test_stac_1.1.json"), base_dir=GD)
    assert (ds.width, ds.height) == (20, 20)
    assert ds.srs_name == "NAD27 / UTM zone 11N"
    assert checksum(ds.read()) == 4672
