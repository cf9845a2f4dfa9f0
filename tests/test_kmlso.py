"""KML SuperOverlay driver vs the reference autotest fixtures
(autotest/gdrivers/kmlsuperoverlay.py, data/kml/*)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.functions.checksum import checksum
from gdal_spark.raster.kmlso import (
    kmlso_open,
    kmlso_open_kmz,
    kmlso_write,
)

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(D, "kml")),
    reason="reference autotest data missing")


@pytest.fixture(scope="module")
def files() -> dict[str, bytes]:
    out = {}
    for sub in ("kml/", ""):
        full = os.path.join(D, sub)
        for n in os.listdir(full):
            p = os.path.join(full, n)
            if os.path.isfile(p):
                with open(p, "rb") as fh:
                    out[sub + n] = fh.read()
    return out


def test_kmz_single_doc_structure(files):
    """test_kmlsuperoverlay_6: kmlimage.kmz checksums + gt + overview."""
    ds = kmlso_open_kmz(files["kml/kmlimage.kmz"])
    ref_gt = [1.2554125761846773, 1.6640895429971981e-05, 0.0,
              43.452120815728101, 0.0, -1.0762348187666334e-05]
    for i in range(6):
        assert ds.geotransform[i] == pytest.approx(ref_gt[i], abs=1e-6)
    img = ds.read()
    for b in range(4):
        assert checksum(img[:, :, b]) == 47673
    assert len(ds.overviews) == 1
    ovr = ds.overviews[0].read()
    assert checksum(ovr[:, :, 0]) == 61070


def test_single_overlay(files):
    """test_kmlsuperoverlay_7: small_world.kml."""
    ds = kmlso_open("kml/small_world.kml", files)
    assert ds.geotransform == pytest.approx(
        (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9), abs=1e-6)
    img = ds.read()
    assert checksum(img[:, :, 0]) == 30111


@pytest.mark.parametrize("name", [
    "kml/small_world_in_document_folder_pct.kml",
    "kml/small_world_in_document_pct.kml",
])
def test_single_overlay_pct(files, name):
    """Paletted icons stay single-band with a color table."""
    ds = kmlso_open(name, files)
    assert ds.geotransform == pytest.approx(
        (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9), abs=1e-6)
    assert ds.band_count == 1
    assert ds.palette is not None and ds.palette.shape[1] == 3


def test_gx_latlonquad(files):
    """test_kmlsuperoverlay_gx_latlonquad."""
    ds = kmlso_open("kml/small_world_latlonquad.kml", files)
    assert ds.geotransform == pytest.approx(
        (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9), abs=1e-6)


def test_write_layout_512():
    """test_kmlsuperoverlay_3 layout: 512x512 -> zooms 0..1, 2x2 tiles
    at zoom 1, bbox strings in the root."""
    arr = np.zeros((512, 512, 3), np.uint8)
    gt = (-117.639, (117.639 - 117.309) / 512, 0,
          33.903, 0, -(33.903 - 33.625) / 512)
    out = kmlso_write(arr, gt, fmt="PNG")
    assert set(n for n in out) == {
        "doc.kml",
        "0/0/0.png", "0/0/0.kml",
        "1/0/0.png", "1/0/0.kml", "1/0/1.png", "1/0/1.kml",
        "1/1/0.png", "1/1/0.kml", "1/1/1.png", "1/1/1.kml",
    }
    root = out["doc.kml"].decode()
    assert "<north>33.903" in root
    assert "<south>33.625" in root
    assert "<east>-117.309" in root
    assert "<west>-117.639" in root


def test_write_read_roundtrip_exact():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, (512, 512, 3)).astype(np.uint8)
    gt = (10.0, 0.01, 0, 50.0, 0, -0.01)
    out = kmlso_write(arr, gt, fmt="PNG")
    ds = kmlso_open("doc.kml", out)
    assert (ds.width, ds.height) == (512, 512)
    assert ds.geotransform == pytest.approx(gt)
    img = ds.read()
    np.testing.assert_array_equal(img[:, :, :3], arr)
    assert (img[:, :, 3] == 255).all()


def test_write_east_west_ordering():
    """test_kmlsuperoverlay_5 invariant: east >= west in every box."""
    import re
    arr = np.zeros((256, 512, 3), np.uint8)
    gt = (170.0, 0.05, 0, 10.0, 0, -0.05)  # crosses antimeridian range
    out = kmlso_write(arr, gt, fmt="PNG")
    for name, payload in out.items():
        if not name.endswith(".kml"):
            continue
        text = payload.decode()
        easts = [float(v) for v in re.findall(r"<east>([^<]+)</east>", text)]
        wests = [float(v) for v in re.findall(r"<west>([^<]+)</west>", text)]
        for e, w in zip(easts, wests):
            assert e >= w, name


def test_write_read_non_power_of_two():
    """501x501: the reference's floor tile grid drops the trailing
    partial row/column (bottom-anchored), and the remaining 500x500
    mosaic round-trips pixel-exactly."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (501, 501, 3)).astype(np.uint8)
    gt = (0.0, 0.01, 0, 5.01, 0, -0.01)
    out = kmlso_write(arr, gt, fmt="PNG")
    ds = kmlso_open("doc.kml", out)
    assert (ds.width, ds.height) == (500, 500)
    img = ds.read()
    np.testing.assert_array_equal(img[:, :, :3], arr[1:501, :500])
    # every advertised box stays inside the source extent
    import re
    for name, payload in out.items():
        if name.endswith(".kml"):
            for e in re.findall(r"<east>([^<]+)</east>", payload.decode()):
                assert float(e) <= 5.0100001
