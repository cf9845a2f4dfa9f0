"""`gdal mdim mosaic` parity (apps/gdalalg_mdim_mosaic.cpp): union
extent from regularly spaced indexing variables, integral-offset
placement, gap fill, overlap last-wins paste, and the validation
errors (inconsistent dims/chunking, non-aligned offsets)."""

import numpy as np
import pytest

from gdal_spark import multidim as MD


def _arr(spark, shape, chunks, base):
    return MD.create(
        spark, shape, chunks, lambda i, j: base + i * 10 + j
    )


def test_mosaic_two_tiles_side_by_side(spark):
    a = _arr(spark, (4, 4), (2, 2), 0.0)
    b = _arr(spark, (4, 4), (2, 2), 1000.0)
    # b starts 4 index-steps to the right: origins differ by 4*step
    out = MD.mosaic(
        [a, b], origins=[(0.0, 0.0), (0.0, 2.0)], steps=(1.0, 0.5)
    )
    assert out.shape == (4, 8)
    got = out.collect_numpy()
    i, j = np.mgrid[0:4, 0:4]
    assert np.array_equal(got[:, :4], i * 10 + j)
    assert np.array_equal(got[:, 4:], 1000 + i * 10 + j)


def test_mosaic_gap_fill_and_overlap(spark):
    a = _arr(spark, (2, 2), (2, 2), 0.0)
    b = _arr(spark, (2, 2), (2, 2), 500.0)
    # place b at (0, 4): a 2-wide gap between them, filled with -1
    out = MD.mosaic(
        [a, b], origins=[(0.0, 0.0), (0.0, 4.0)], steps=(1.0, 1.0),
        fill_value=-1.0,
    )
    assert out.shape == (2, 6)
    got = out.collect_numpy()
    assert np.all(got[:, 2:4] == -1.0)
    assert got[0, 0] == 0.0 and got[0, 4] == 500.0
    # overlapping placement: the later input wins on the shared cells
    out2 = MD.mosaic(
        [a, b], origins=[(0.0, 0.0), (0.0, 1.0)], steps=(1.0, 1.0)
    )
    got2 = out2.collect_numpy()
    assert out2.shape == (2, 3)
    assert got2[0, 0] == 0.0
    assert got2[0, 1] == 500.0  # b overwrote a's column 1
    assert got2[0, 2] == 501.0


def test_mosaic_unaligned_chunk_offsets(spark):
    # offset 1 is NOT a multiple of the chunk size: the scatter path
    # must still re-tile correctly
    a = _arr(spark, (4, 4), (2, 2), 0.0)
    b = _arr(spark, (4, 4), (2, 2), 100.0)
    out = MD.mosaic(
        [a, b], origins=[(0.0, 0.0), (1.0, 5.0)], steps=(1.0, 1.0),
        fill_value=np.nan,
    )
    assert out.shape == (5, 9)
    got = out.collect_numpy()
    i, j = np.mgrid[0:4, 0:4]
    assert np.array_equal(got[0:4, 0:4], i * 10 + j)
    assert np.array_equal(got[1:5, 5:9], 100 + i * 10 + j)
    assert np.isnan(got[0, 8]) and np.isnan(got[4, 0])


def test_mosaic_validation_errors(spark):
    a = _arr(spark, (4, 4), (2, 2), 0.0)
    b = _arr(spark, (4, 4), (4, 4), 0.0)
    with pytest.raises(ValueError, match="chunking"):
        MD.mosaic([a, b], origins=[(0, 0), (0, 0)], steps=(1.0, 1.0))
    with pytest.raises(ValueError, match="aligned"):
        MD.mosaic(
            [a, a], origins=[(0.0, 0.0), (0.0, 0.5)], steps=(1.0, 1.0)
        )
    with pytest.raises(ValueError, match="at least one"):
        MD.mosaic([], origins=[], steps=(1.0, 1.0))
