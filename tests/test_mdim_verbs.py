"""mdim rechunk / compare / reproject (gdal mdim convert chunking,
apps/gdalalg_mdim_compare.cpp, apps/gdalalg_mdim_reproject.cpp)."""

import numpy as np
import pytest

from gdal_spark import multidim as MD


def test_rechunk_identity(spark):
    a = MD.create(spark, (6, 10), (3, 5), lambda i, j: i * 100 + j)
    b = MD.rechunk(a, (4, 4))
    assert b.chunks == (4, 4) and b.shape == (6, 10)
    assert np.array_equal(a.collect_numpy(), b.collect_numpy())


def test_compare_equal_and_diff(spark):
    a = MD.create(spark, (4, 6), (2, 3), lambda i, j: i + j)
    b = MD.create(spark, (4, 6), (2, 3), lambda i, j: i + j)
    assert MD.compare(a, b).count() == 0
    c = MD.create(
        spark, (4, 6), (2, 3),
        lambda i, j: (i + j) + ((i == 1) & (j == 4)) * 9.0,
    )
    rows = MD.compare(a, c).collect()
    assert len(rows) == 1
    assert (rows[0].c0, rows[0].c1) == (0, 1)
    assert rows[0].n_diff == 1 and rows[0].max_abs_diff == 9.0
    # different chunking normalizes via rechunk
    d = MD.rechunk(c, (4, 2))
    rows2 = MD.compare(a, d).collect()
    assert len(rows2) == 1 and rows2[0].n_diff == 1
    with pytest.raises(ValueError, match="shape"):
        MD.compare(a, MD.create(spark, (4, 4), (2, 2), lambda i, j: i))


def test_reproject_identity_grid(spark):
    # same CRS pair forward/backward: 4326 -> 3857 on a tiny lon/lat
    # grid; compare against the raster warp kernel applied per slice
    from gdal_spark.raster.warp import warp_array

    t = 3
    md = MD.create(
        spark, (t, 8, 8), (1, 8, 8),
        lambda k, i, j: k * 1000 + i * 10 + j,
    )
    src_gt = (0.0, 0.125, 0.0, 1.0, 0.0, -0.125)  # 1x1 deg near equator
    dst_gt = (0.0, 13914.0, 0.0, 111325.1, 0.0, -13915.0)
    out = MD.reproject(md, src_gt, dst_gt, (8, 8))
    assert out.shape == (t, 8, 8)
    got = out.collect_numpy()
    for k in range(t):
        sl = (
            np.arange(8)[:, None] * 10 + np.arange(8)[None, :] + k * 1000
        ).astype(np.float64)
        want = warp_array(sl, src_gt, dst_gt, 8, 8)
        assert np.array_equal(got[k], want.astype(np.float64)), k
