"""nearblack / clean-collar parity (apps/nearblack_lib.cpp) against the
reference's own autotest expectations
(autotest/utilities/test_nearblack_lib.py): the full grid-mask matrix
and the rgbsmall.tif checksums."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.functions import checksum as CK
from gdal_spark.raster.collar import nearblack

GDRIVERS_DATA = "/root/reference/autotest/gdrivers/data"


def _mask_of(in_rows, max_non_black=0):
    arr = np.array(in_rows, np.uint8)
    _, mask = nearblack(arr, max_non_black=max_non_black, set_mask=True)
    return mask.tolist()


def test_all_valid():
    rows = [[255] * 5] * 5
    assert _mask_of(rows, 1) == [[255] * 5] * 5


def test_all_invalid():
    rows = [[0] * 5] * 5
    assert _mask_of(rows, 1) == [[0] * 5] * 5


def test_single_pixel_valid_eroded():
    rows = [[0] * 5, [0] * 5, [0, 0, 255, 0, 0], [0] * 5, [0] * 5]
    assert _mask_of(rows, 1) == [[0] * 5] * 5


@pytest.mark.parametrize("max_non_black", [0, 1, 5])
def test_all_contour_valid(max_non_black):
    rows = [
        [255, 255, 255, 255, 255],
        [255, 0, 0, 0, 255],
        [255, 0, 0, 0, 255],
        [255, 0, 0, 0, 255],
        [255, 255, 255, 255, 255],
    ]
    assert _mask_of(rows, max_non_black) == [[255] * 5] * 5


def test_erosion_from_left():
    rows = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [0, 0, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    want = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [0, 0, 0, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    assert _mask_of(rows, 1) == want


def test_erosion_from_right():
    rows = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 0, 0],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    want = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 0, 0, 0],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    assert _mask_of(rows, 1) == want


def test_erosion_from_top():
    rows = [
        [255, 0, 0, 0, 255],
        [255, 255, 0, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    want = [
        [255, 0, 0, 0, 255],
        [255, 0, 0, 0, 255],
        [255, 255, 0, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    assert _mask_of(rows, 1) == want


def test_erosion_from_bottom():
    rows = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 0, 255, 255],
        [255, 0, 0, 0, 255],
    ]
    want = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 0, 255, 255],
        [255, 0, 0, 0, 255],
        [255, 0, 0, 0, 255],
    ]
    assert _mask_of(rows, 1) == want


def test_erosion_from_top_and_bottom():
    rows = [
        [0, 0, 0, 0, 0, 0, 0],
        [0, 0, 255, 255, 255, 0, 0],
        [0, 0, 255, 255, 255, 0, 0],
        [0, 255, 255, 255, 255, 255, 0],
        [0, 0, 255, 255, 255, 0, 0],
        [0, 0, 255, 255, 255, 0, 0],
        [0, 0, 0, 0, 0, 0, 0],
    ]
    want = [
        [0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 255, 0, 0, 0],
        [0, 0, 0, 255, 0, 0, 0],
        [0, 0, 0, 255, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0],
    ]
    assert _mask_of(rows, 1) == want


@pytest.mark.skipif(
    not os.path.isdir(GDRIVERS_DATA), reason="gdrivers data not present"
)
def test_nearblack_lib_1_rgbsmall_checksums():
    """gdal.Nearblack(rgbsmall.tif, maxNonBlack=0, nearDist=15):
    band checksums 21106 / 20736 / 21309."""
    from gdal_spark.functions import tiff

    arr, _ = tiff.tiff_parse(
        open(os.path.join(GDRIVERS_DATA, "rgbsmall.tif"), "rb").read()
    )
    out, _ = nearblack(arr, max_non_black=0, near_dist=15)
    cs = CK.checksum_image(out.astype(np.int32))
    assert cs == [21106, 20736, 21309]


@pytest.mark.skipif(
    not os.path.isdir(GDRIVERS_DATA), reason="gdrivers data not present"
)
def test_nearblack_lib_2_alpha_checksum():
    """setAlpha=True: alpha band checksum 22002."""
    from gdal_spark.functions import tiff

    arr, _ = tiff.tiff_parse(
        open(os.path.join(GDRIVERS_DATA, "rgbsmall.tif"), "rb").read()
    )
    out, _ = nearblack(arr, max_non_black=0, set_alpha=True)
    assert out.shape[2] == 4
    assert CK.checksum(out[:, :, 3].astype(np.int32)) == 22002


@pytest.mark.skipif(
    not os.path.isdir(GDRIVERS_DATA), reason="gdrivers data not present"
)
def test_nearblack_lib_5_mask_checksum():
    """setMask=True: mask band checksum 22002."""
    from gdal_spark.functions import tiff

    arr, _ = tiff.tiff_parse(
        open(os.path.join(GDRIVERS_DATA, "rgbsmall.tif"), "rb").read()
    )
    _, mask = nearblack(arr, max_non_black=0, set_mask=True)
    assert CK.checksum(mask.astype(np.int32)) == 22002


def test_white_collar_and_replace_value():
    """-white: near-255 collar replaced by exact 255."""
    rows = np.array(
        [
            [250, 252, 255, 251, 253],
            [254, 100, 100, 100, 252],
            [255, 100, 100, 100, 251],
            [253, 100, 100, 100, 250],
            [251, 252, 253, 254, 255],
        ],
        np.uint8,
    )
    out, mask = nearblack(rows, max_non_black=0, white=True, set_mask=True)
    assert (out[0] == 255).all() and (out[-1] == 255).all()
    assert (out[1:4, 1:4] == 100).all()
    assert mask[2, 2] == 255 and mask[0, 0] == 0


# ---------------------------------------------------------------------------
# -alg floodfill (nearblack_lib_floodfill.cpp)
# ---------------------------------------------------------------------------


def _mask_of_ff(in_rows, max_non_black=0):
    from gdal_spark.raster.collar import nearblack_floodfill

    arr = np.array(in_rows, np.uint8)
    _, mask = nearblack_floodfill(
        arr, max_non_black=max_non_black, set_mask=True
    )
    return mask.tolist()


@pytest.mark.parametrize("max_non_black", [0, 1, 5])
def test_floodfill_all_contour_valid(max_non_black):
    rows = [
        [255, 255, 255, 255, 255],
        [255, 0, 0, 0, 255],
        [255, 0, 0, 0, 255],
        [255, 0, 0, 0, 255],
        [255, 255, 255, 255, 255],
    ]
    assert _mask_of_ff(rows, max_non_black) == [[255] * 5] * 5


def test_floodfill_erosion_from_left():
    rows = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [0, 0, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    want = [
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
        [0, 0, 0, 255, 255],
        [255, 255, 255, 255, 255],
        [255, 255, 255, 255, 255],
    ]
    assert _mask_of_ff(rows, 1) == want


@pytest.mark.skipif(
    not os.path.isdir(GDRIVERS_DATA), reason="gdrivers data not present"
)
def test_nearblack_lib_4_white_differential_checksums():
    """test_nearblack_lib_4: rgbsmall warped INIT_DEST=255/srcNodata=0
    then -white -setAlpha: alpha checksum 24151 (twopasses) vs 24024
    (floodfill) — the two algorithms' documented divergence."""
    from gdal_spark.functions import tiff
    from gdal_spark.raster.collar import nearblack_floodfill

    arr, _ = tiff.tiff_parse(
        open(os.path.join(GDRIVERS_DATA, "rgbsmall.tif"), "rb").read()
    )
    nod = (arr == 0).all(axis=2)
    src = np.where(nod[:, :, None], 255, arr).astype(np.uint8)
    out_tp, _ = nearblack(src, max_non_black=0, white=True, set_alpha=True)
    assert CK.checksum(out_tp[:, :, 3].astype(np.int32)) == 24151
    out_ff, _ = nearblack_floodfill(
        src, max_non_black=0, white=True, set_alpha=True
    )
    assert CK.checksum(out_ff[:, :, 3].astype(np.int32)) == 24024


def test_floodfill_interior_lake_survives():
    """A near-black lake NOT connected to the border is kept by
    floodfill but eroded column-wise by two-passes' vertical check."""
    from gdal_spark.raster.collar import nearblack_floodfill

    rows = np.full((7, 7), 200, np.uint8)
    rows[3, 3] = 0
    _, mask_ff = nearblack_floodfill(rows, max_non_black=0, set_mask=True)
    assert mask_ff[3, 3] == 255  # lake survives
