"""BAG and S-102 drivers vs the reference autotests
(autotest/gdrivers/bag.py, autotest/gdrivers/s102.py)."""

import os

import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.bag_s102 import bag_open, s102_open

DB = "/root/reference/autotest/gdrivers/data/bag"
DS = "/root/reference/autotest/gdrivers/data/s102"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DB), reason="reference autotest data missing"
)


def test_bag_true_n_nominal():
    """test_bag_2: elevation/uncertainty/nominal bands with checksums
    1072/150/1315, min/max attributes, nodata 1e6, xml:BAG metadata."""
    ds = bag_open(open(os.path.join(DB, "true_n_nominal.bag"), "rb").read())
    assert ds.band_names == ["elevation", "uncertainty", "nominal_elevation"]
    assert checksum(ds.read_band(1)) == 1072
    assert checksum(ds.read_band(2)) == 150
    assert checksum(ds.read_band(3)) == 1315
    mn, mx = ds.band_min_max(1)
    assert mn == pytest.approx(10, abs=0.01)
    assert mx == pytest.approx(19.8, abs=0.01)
    assert ds.nodata(1) == pytest.approx(1e6)
    assert ds.metadata_xml.startswith("<?xml")


def test_bag_southern_hemi():
    """test_bag_3: two bands, checksums 21402/33216, false northing in
    the embedded ISO metadata."""
    ds = bag_open(
        open(os.path.join(DB, "southern_hemi_false_northing.bag"),
             "rb").read()
    )
    assert ds.band_count == 2
    assert checksum(ds.read_band(1)) == 21402
    assert checksum(ds.read_band(2)) == 33216
    assert "10000000" in ds.metadata_xml  # false_northing


@pytest.mark.parametrize("name", ["test_s102_v2.1.h5", "test_s102_v2.2.h5"])
def test_s102_basic(name):
    s = s102_open(open(os.path.join(DS, name), "rb").read())
    assert (s.width, s.height) == (3, 2)
    assert s.epsg == 4326
    assert s.geotransform == pytest.approx(
        (1.8, 0.4, 0.0, 48.75, 0.0, -0.5)
    )
    assert s.depth.ravel().tolist() == [1e6, 4, 5, 0, 1, 2]
    assert s.uncertainty.ravel().tolist() == [103, 1e6, 105, 100, 101, 102]
    assert (s.depth_min, s.depth_max) == (0, 5)
    assert (s.unc_min, s.unc_max) == (100, 105)
    assert s.nodata == 1e6
    assert s.band_descriptions == ["depth", "uncertainty"]
    assert s.unit == "metre"
    assert s.metadata["VERTICAL_DATUM_ABBREV"] == "MLLW"
    assert s.metadata["VERTICAL_DATUM_NAME"] == "meanLowerLowWater"
    assert s.metadata["geographicIdentifier"] == "Somewhere"
    assert s.metadata["issueDate"] == "2023-12-31"


def test_s102_elevation_mode():
    """test_s102_elevation: DEPTH_OR_ELEVATION=ELEVATION negates the
    depth band (nodata untouched) and flips min/max."""
    s = s102_open(
        open(os.path.join(DS, "test_s102_v2.1.h5"), "rb").read(),
        "ELEVATION",
    )
    assert s.depth.ravel().tolist() == [1e6, -4, -5, 0, -1, -2]
    assert (s.depth_min, s.depth_max) == (-5, 0)
    assert s.band_descriptions[0] == "elevation"
