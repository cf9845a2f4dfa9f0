"""Line-of-sight parity (alg/los.cpp via autotest/alg/los.py
test_los_basic on a 2x1 zero raster) plus wall-occlusion geometry on
the viewshed wall fixture and the distributed form."""

import numpy as np
import pytest

from gdal_spark.raster.los import is_line_of_sight_visible, los_tiles

Z2 = np.zeros((1, 2))  # the autotest MEM 2x1 raster


def test_los_basic_autotest():
    vis, ix, iy = is_line_of_sight_visible(Z2, 0, 0, 1, 1, 0, 1)
    assert vis and ix == -1 and iy == -1
    assert is_line_of_sight_visible(Z2, 0, 0, 1, 0, 0, 1)[0]
    assert not is_line_of_sight_visible(Z2, 0, 0, -1, 1, 0, 1)[0]
    assert not is_line_of_sight_visible(Z2, 0, 0, 1, 1, 0, -1)[0]
    with pytest.raises(IndexError):
        is_line_of_sight_visible(Z2, 0, 0, 1, 2, 0, 1)


def test_los_endpoint_intersections():
    vis, ix, iy = is_line_of_sight_visible(Z2, 0, 0, -1, 1, 0, 1)
    assert (ix, iy) == (0, 0)
    vis, ix, iy = is_line_of_sight_visible(Z2, 0, 0, 1, 1, 0, -1)
    assert (ix, iy) == (1, 0)


def test_los_wall_horizontal_and_diagonal():
    dem = np.zeros((16, 16))
    dem[:, 7] = 10.0  # wall at column 7
    # horizontal ray under the wall top: blocked at the wall
    vis, ix, iy = is_line_of_sight_visible(dem, 0, 8, 5.0, 15, 8, 5.0)
    assert not vis and (ix, iy) == (7, 8)
    # over the wall: visible
    assert is_line_of_sight_visible(dem, 0, 8, 11.0, 15, 8, 11.0)[0]
    # ramp that clears the wall exactly at the wall column:
    # z(7) = 0 + 7/15 * z_b >= 10  ->  z_b >= 150/7
    zb = 150.0 / 7.0 + 1e-9
    assert is_line_of_sight_visible(dem, 0, 8, 0.0, 15, 8, zb)[0]
    # diagonal: passes (7,7); euclidean ratio = 7/15
    vis, ix, iy = is_line_of_sight_visible(dem, 0, 0, 5.0, 15, 15, 5.0)
    assert not vis and (ix, iy) == (7, 7)
    assert is_line_of_sight_visible(dem, 0, 0, 5.0, 15, 15, zb * 3)[0]


def test_los_vertical_and_reverse():
    dem = np.zeros((16, 16))
    dem[7, :] = 10.0  # wall at row 7
    vis, ix, iy = is_line_of_sight_visible(dem, 3, 0, 5.0, 3, 15, 5.0)
    assert not vis and (ix, iy) == (3, 7)
    vis, ix, iy = is_line_of_sight_visible(dem, 3, 15, 5.0, 3, 0, 5.0)
    assert not vis and (ix, iy) == (3, 7)
    assert is_line_of_sight_visible(dem, 3, 0, 12.0, 3, 15, 12.0)[0]


def test_los_tiles_distributed(spark):
    dem = np.zeros((16, 16))
    dem[:, 7] = 10.0
    df = spark.createDataFrame(
        [
            ("q0", 0, 8, 5.0, 15, 8, 5.0),
            ("q1", 0, 8, 11.0, 15, 8, 11.0),
        ],
        "query_id string, xa int, ya int, za double, "
        "xb int, yb int, zb double",
    )
    got = {r.query_id: r for r in los_tiles(df, dem).collect()}
    assert not got["q0"].visible and got["q0"].ix == 7
    assert got["q1"].visible and got["q1"].ix == -1
