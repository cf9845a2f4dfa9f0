"""Selafin driver vs the reference autotest scenarios
(autotest/ogr/ogr_selafin.py)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.sources.selafin import (
    SelafinHeader,
    add_elements,
    element_features,
    layer_names,
    point_features,
    selafin_read,
    selafin_write,
)


def _grid_header() -> SelafinHeader:
    """The autotest fixture: 5x5 nodes with value i*5+j, EPSG 4326."""
    h = SelafinHeader()
    h.title = "name"
    h.variables = ["value"]
    h.epsg = 4326
    pts = [(float(i), float(j)) for i in range(5) for j in range(5)]
    h.x = np.array([p[0] for p in pts])
    h.y = np.array([p[1] for p in pts])
    h.n_points = 25
    h.border = np.zeros(25, np.int64)
    vals = np.array([[i * 5 + j for i in range(5) for j in range(5)]],
                    dtype=np.float64)
    h.steps = [(0.0, vals)]
    return h


def test_roundtrip_points():
    h = _grid_header()
    h2 = selafin_read(selafin_write(h))
    assert h2.title == "name"
    assert h2.variables == ["value"]
    assert h2.epsg == 4326
    assert h2.n_points == 25 and h2.n_elements == 0
    np.testing.assert_allclose(h2.x, h.x)
    np.testing.assert_allclose(h2.y, h.y)
    feats = point_features(h2)
    assert len(feats) == 25
    assert feats[7] == (1.0, 2.0, {"value": 7.0})


def test_create_elements_matches_autotest():
    """test_ogr_selafin_create_elements: 16 grid squares + one square
    whose 3 outside vertices become new nodes -> 28 points; element 5
    averages to 9, element 10 to 15."""
    h = _grid_header()
    rings = []
    for i in range(4):
        for j in range(4):
            rings.append([(i, j), (i, j + 1), (i + 1, j + 1), (i + 1, j),
                          (i, j)])
    rings.append([(4.0, 4.0), (4.0, 5.0), (5.0, 5.0), (5.0, 4.0),
                  (4.0, 4.0)])
    add_elements(h, rings)
    assert h.n_elements == 17
    assert h.points_per_element == 4
    assert h.n_points == 28, "3 new nodes should have been created"

    # round-trip through the binary form, then check element averages
    h2 = selafin_read(selafin_write(h))
    assert h2.n_elements == 17 and h2.n_points == 28
    elems = element_features(h2)
    assert elems[5][1]["value"] == pytest.approx(9.0, abs=0.01)
    assert elems[10][1]["value"] == pytest.approx(15.0, abs=0.01)
    # the new-node element averages the one real node (16) with 3 zeros
    assert elems[16][1]["value"] == pytest.approx(24.0 / 4, abs=0.01)
    # rings are closed polygons of ppe+1 vertices
    assert elems[0][0].shape == (5, 2)
    np.testing.assert_allclose(elems[0][0][0], elems[0][0][-1])


def test_set_field_equivalent():
    """test_ogr_selafin_set_field: new variable whose values are 10x the
    original — exercised through the value arrays + round-trip."""
    h = _grid_header()
    h.variables = ["reverse", "new"]
    base = h.steps[0][1][0]
    h.steps = [(0.0, np.vstack([base * 10.0, base]))]
    h2 = selafin_read(selafin_write(h))
    feats = point_features(h2)
    # feature 11 -> value 11, reverse 110 (field order [reverse, new])
    assert feats[11][2]["new"] == pytest.approx(11.0)
    assert feats[11][2]["reverse"] == pytest.approx(110.0, abs=0.01)


def test_layer_names_plain_and_dated():
    h = _grid_header()
    assert layer_names(h) == ["name_p0", "name_e0"]
    h.start_date = [2014, 3, 2, 10, 30, 5]
    assert layer_names(h) == [
        "name_p2014_03_02_10_30_05", "name_e2014_03_02_10_30_05"
    ]


def test_origin_offset_and_date_roundtrip():
    h = _grid_header()
    h.origin = (600000.0, 2200000.0)
    h.x = h.x + 600000.0
    h.y = h.y + 2200000.0
    h.start_date = [2014, 3, 2, 10, 30, 5]
    h2 = selafin_read(selafin_write(h))
    assert h2.origin == (600000.0, 2200000.0)
    assert h2.start_date == [2014, 3, 2, 10, 30, 5]
    np.testing.assert_allclose(h2.x, h.x)  # origin re-applied on read


def test_multi_step():
    h = _grid_header()
    v0 = h.steps[0][1]
    h.steps = [(0.0, v0), (3600.0, v0 * 2.0)]
    h2 = selafin_read(selafin_write(h))
    assert len(h2.steps) == 2
    assert h2.steps[1][0] == 3600.0
    assert point_features(h2, 1)[7][2]["value"] == pytest.approx(14.0)
    assert len(layer_names(h2)) == 4


def test_rejects_garbage():
    with pytest.raises(Exception):
        selafin_read(b"\x00\x01\x02")
    # record length beyond file size
    with pytest.raises(ValueError):
        selafin_read(b"\x7f\xff\xff\xff" + b"x" * 16)
