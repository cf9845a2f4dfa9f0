"""TIGER/Line reader (sources/tiger.py) over synthetic 2002-layout
records."""

from __future__ import annotations

import numpy as np

from gdal_spark.sources.tiger import tiger_open


def _rt1(tlid: int, fename: str, cfcc: str, fr, to) -> str:
    rec = [" "] * 228
    rec[0] = "1"
    rec[1:5] = "0021"

    def put(beg, end, val, right=False):
        s = str(val)
        w = end - beg + 1
        s = s.rjust(w) if right else s.ljust(w)
        rec[beg - 1:end] = s

    put(6, 15, tlid, right=True)
    put(20, 49, fename)
    put(56, 58, cfcc)
    put(191, 200, round(fr[0] * 1e6), right=True)
    put(201, 209, round(fr[1] * 1e6), right=True)
    put(210, 219, round(to[0] * 1e6), right=True)
    put(220, 228, round(to[1] * 1e6), right=True)
    return "".join(rec)


def _rt2(tlid: int, rtsq: int, pts) -> str:
    rec = [" "] * 208
    rec[0] = "2"
    rec[1:5] = "0021"
    s = str(tlid).rjust(10)
    rec[5:15] = s
    rec[15:18] = str(rtsq).rjust(3)
    for i, (x, y) in enumerate(pts):
        beg = 19 + 19 * i
        rec[beg - 1:beg + 9] = str(round(x * 1e6)).rjust(10)
        rec[beg + 9:beg + 18] = str(round(y * 1e6)).rjust(9)
    return "".join(rec)


def _rt7(land: int, name: str, cfcc: str, pt) -> str:
    rec = [" "] * 74
    rec[0] = "7"
    rec[1:5] = "0021"
    rec[5:10] = "1001".rjust(5)
    rec[10:20] = str(land).rjust(10)
    rec[21:24] = cfcc
    rec[24:54] = name.ljust(30)
    if pt is not None:
        rec[54:64] = str(round(pt[0] * 1e6)).rjust(10)
        rec[64:73] = str(round(pt[1] * 1e6)).rjust(9)
    return "".join(rec)


def test_complete_chain_with_shape_points():
    rt1 = "\n".join([
        _rt1(1001, "MAIN ST", "A41", (-86.5, 32.6), (-86.48, 32.61)),
        _rt1(1002, "OAK AVE", "A41", (-86.51, 32.62), (-86.52, 32.63)),
    ])
    rt2 = "\n".join([
        _rt2(1001, 1, [(-86.495, 32.603), (-86.49, 32.606)]),
        _rt2(1002, 1, [(-86.515, 32.625)]),
    ])
    m = tiger_open({"RT1": rt1, "RT2": rt2})
    assert m.version == "0021"
    assert len(m.chains) == 2
    c = m.chains[0]
    assert c["TLID"] == 1001
    assert c["FENAME"] == "MAIN ST"
    assert c["CFCC"] == "A41"
    np.testing.assert_allclose(
        c["geometry"],
        [(-86.5, 32.6), (-86.495, 32.603), (-86.49, 32.606),
         (-86.48, 32.61)])
    np.testing.assert_allclose(
        m.chains[1]["geometry"],
        [(-86.51, 32.62), (-86.515, 32.625), (-86.52, 32.63)])


def test_chain_without_shape_points():
    m = tiger_open({"RT1": _rt1(7, "X", "A41", (0.5, 1.5), (2.5, 3.5))})
    np.testing.assert_allclose(
        m.chains[0]["geometry"], [(0.5, 1.5), (2.5, 3.5)])


def test_multi_rt2_records_for_one_tlid():
    """>10 shape points span several sequential RT2 records."""
    pts = [(-86.0 - i * 0.001, 32.0 + i * 0.001) for i in range(13)]
    rt2 = "\n".join([_rt2(5, 1, pts[:10]), _rt2(5, 2, pts[10:])])
    m = tiger_open({
        "RT1": _rt1(5, "LONG RD", "A31", (-85.9, 31.9), (-86.1, 32.1)),
        "RT2": rt2,
    })
    g = m.chains[0]["geometry"]
    assert len(g) == 15
    np.testing.assert_allclose(g[1:14], pts)


def test_landmarks():
    rt7 = "\n".join([
        _rt7(9001, "CITY PARK", "D85", (-86.44, 32.55)),
        _rt7(9002, "AREA LANDMARK", "D10", None),
    ])
    m = tiger_open({"RT7": rt7})
    assert len(m.landmarks) == 2
    lm = m.landmarks[0]
    assert lm["LAND"] == 9001
    assert lm["LANAME"] == "CITY PARK"
    assert lm["geometry"] == (-86.44, 32.55)
    assert m.landmarks[1]["geometry"] is None
