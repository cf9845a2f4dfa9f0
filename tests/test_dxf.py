"""DXF parity (ogr/ogrsf_frmts/dxf via autotest/ogr/ogr_dxf.py tests
2-6/9/46/47 on assorted.dxf + dimension fixtures): ellipse
tessellation through the exact approximateArcAngles math,
point/line/mtext geometry, field mapping, merged-block INSERT
(SimplifyBlockGeometry), and the DIMENSION fallback renderer
(DIMSTYLE table + XDATA DSTYLE overrides, default arrowheads,
ACTextUnescape'd '<>' labels)."""

import re

import numpy as np
import pytest

from gdal_spark.sources.dxf import approximate_arc_angles, parse_dxf, read_dxf

ASSORTED = "/root/reference/autotest/ogr/data/dxf/assorted.dxf"


def _feats():
    return parse_dxf(open(ASSORTED, encoding="latin-1").read())


def _pts(wkt):
    return np.array(
        [
            (float(m.group(1)), float(m.group(2)))
            for m in re.finditer(r"(-?[\d.]+) (-?[\d.]+)", wkt)
        ]
    )


def _env_area(wkt):
    p = _pts(wkt)
    return (p[:, 0].max() - p[:, 0].min()) * (p[:, 1].max() - p[:, 1].min())


def test_dxf_2_first_ellipse():
    f = _feats()[0]
    assert f["Layer"] == "0"
    assert f["SubClasses"] == "AcDbEntity:AcDbEllipse"
    assert f["Linetype"] == "ByLayer"
    assert f["EntityHandle"] == "43"
    assert f["wkt"].startswith("LINESTRING")
    assert _env_area(f["wkt"]) == pytest.approx(1596.12, abs=0.5)
    p0 = _pts(f["wkt"])[0]
    assert p0[0] == pytest.approx(73.25, abs=0.001)
    assert p0[1] == pytest.approx(139.75, abs=0.001)


def test_dxf_3_second_ellipse():
    f = _feats()[1]
    p0 = _pts(f["wkt"])[0]
    assert p0[0] == pytest.approx(61.133, abs=0.01)
    assert p0[1] == pytest.approx(103.592, abs=0.01)


def test_dxf_4_5_6_point_line_mtext():
    feats = _feats()
    assert feats[2]["wkt"] == "POINT (83.5 160)"
    assert feats[3]["wkt"] == "LINESTRING (97 159.5,108.5 132.25)"
    assert feats[4]["Entity"] == "MTEXT"
    assert feats[4]["wkt"] == "POINT (84 126)"


def test_dxf_insert_merges_block():
    """ogr_dxf_9: merged-block INSERT — the STAR block's five LINEs
    collapse into one MULTILINESTRING on the INSERT feature; the two
    MTEXT labels stay separate and inherit the INSERT's handle."""
    feats = _feats()
    ins = [f for f in feats if f["Entity"] == "INSERT"]
    assert len(ins) == 1
    assert ins[0]["EntityHandle"] == "55"
    got = _pts(ins[0]["wkt"])
    exp = _pts(
        "MULTILINESTRING ((79.069506278985116 121.003652476272777,"
        "79.716898725419625 118.892590150942851),(79.716898725419625"
        " 118.892590150942851,78.140638855839953 120.440702522851453),"
        "(78.140638855839953 120.440702522851453,80.139111190485622"
        " 120.328112532167196),(80.139111190485622 120.328112532167196,"
        "78.619146316248077 118.920737648613908),(78.619146316248077"
        " 118.920737648613908,79.041358781314059 120.975504978601705))"
    )
    np.testing.assert_allclose(got, exp, atol=1e-9)
    labels = [f for f in feats if f["Entity"] == "MTEXT"][-2:]
    assert [f["EntityHandle"] for f in labels] == ["55", "55"]
    np.testing.assert_allclose(
        _pts(labels[0]["wkt"])[0],
        [77.602201427662891, 120.775897075866169], atol=1e-9,
    )


def test_dxf_insert_unmerged_mode():
    """DXF_MERGE_BLOCK_GEOMETRIES=FALSE path: each block entity stays
    its own feature, transformed to the INSERT point."""
    feats = parse_dxf(
        open(ASSORTED, encoding="latin-1").read(), merge_blocks=False
    )
    star = [f for f in feats if f["Entity"] in ("LINE", "MTEXT")][-7:]
    kinds = [f["Entity"] for f in star]
    assert kinds.count("LINE") == 5 and kinds.count("MTEXT") == 2
    # the star's lines sit near the INSERT point, not at the block origin
    xs = np.concatenate([_pts(f["wkt"])[:, 0] for f in star if f["wkt"]])
    assert 75 < xs.mean() < 85


DIMONLY = "/root/reference/autotest/ogr/data/dxf/dimension-entities-only.dxf"


def test_dxf_47_dimension_fallback():
    """ogr_dxf_47: DIMENSION fallback renderer — default style, XDATA
    DSTYLE overrides, and custom DIMSTYLE table entry; each DIMENSION
    emits [MULTILINESTRING, arrowhead*, label] with the DIMDEC-formatted
    '<>' substitution and ACTextUnescape'd text."""
    feats = parse_dxf(open(DIMONLY, encoding="latin-1").read())
    assert [f["Entity"] for f in feats] == ["DIMENSION"] * 12
    assert feats[0]["wkt"] == (
        "MULTILINESTRING ((320010 5820010.250872585,"
        "320000 5820010.250872585),(320010 5820010.0625,"
        "320010 5820010.430872585),(320000 5820010.0625,"
        "320000 5820010.430872585))"
    )
    np.testing.assert_allclose(
        _pts(feats[1]["wkt"]),
        _pts("POLYGON ((320009.82 5820010.28087259,320010.0"
             " 5820010.25087258,320009.82 5820010.22087258,"
             "320009.82 5820010.28087259))"), atol=1e-8,
    )
    assert feats[3]["Text"] == "10.0000"
    assert feats[3]["wkt"] == "POINT (320005 5820010.250872585)"
    # XDATA DSTYLE overrides: DIMSCALE 1.2, DIMASZ 1.25, DIMDEC 1
    assert feats[4]["wkt"] == "MULTILINESTRING ((320005 5820005,320000 5820010))"
    np.testing.assert_allclose(
        _pts(feats[5]["wkt"]),
        _pts("POLYGON ((320004.116116524 5820006.23743687,320005 5820005,"
             "320003.762563133 5820005.88388348,"
             "320004.116116524 5820006.23743687))"), atol=1e-8,
    )
    assert feats[7]["Text"] == "7.1"
    # custom DIMSTYLE: DIMEXO 0.1, DIMEXE 0.5
    assert feats[8]["wkt"] == (
        "MULTILINESTRING ((320000 5820001.5,320005 5820001.5),"
        "(320000 5820002.4,320000 5820001),(320005 5820002.4,320005 5820001))"
    )
    assert feats[11]["Text"] == "±2 3\n\\P4 5.0000"
    assert feats[11]["wkt"] == "POINT (320001.5 5820001.5)"


LEADERS = "/root/reference/autotest/ogr/data/dxf/leader-mleader.dxf"


def test_dxf_44_leader():
    """ogr_dxf_44: LEADER rendering — DIMSTYLE-table + XDATA overrides,
    default-wedge arrowhead with endpoint retreat, custom-arrowhead
    block insertion via the BLOCK_RECORD handle map, DIMTAD hookline
    extension, and cubic B-spline interpolation (NP=D control-point
    solve + rbspline2 at nctrl*8 points)."""
    feats = parse_dxf(open(LEADERS, encoding="latin-1").read())
    # ISO-25 style, overrides DIMASZ 6 / DIMSCALE 1.5; hookline uses the
    # table's DIMGAP 0.625
    assert feats[0]["wkt"] == (
        "LINESTRING (21 40,10 40,19.3125 34.6875,10.3125 34.6875,"
        "-13.59907912687585 34.6875)"
    )
    assert feats[1]["wkt"] == "POLYGON ((21 41.5,30 40,21 38.5,21 41.5))"
    # basic LEADER, no style info: default arrowhead at 3D vertices
    got = _pts(feats[3]["wkt"])[:2]
    np.testing.assert_allclose(
        got,
        [[-20.9782552979609, 38.1443878852919],
         [-12.2152357926375, 44.793971841437]], atol=1e-9,
    )
    np.testing.assert_allclose(
        _pts(feats[4]["wkt"])[0],
        [-20.9601206293303, 38.1204894796201], atol=1e-9,
    )
    # custom arrowhead block (SOLID + LINE) via DIMLDRBLK handle
    assert feats[5]["wkt"] == (
        "LINESTRING (26.8 77.6,10 65,25 55,25 50,40 65,48 65,"
        "169.2825716234652 65)"
    )
    assert feats[6]["Entity"] == "SOLID"
    assert feats[6]["wkt"] == (
        "POLYGON ((27.2 80.4,30.4 82.8,32.8 79.6,29.6 77.2,27.2 80.4))"
    )
    assert feats[7]["wkt"] == "LINESTRING (28.4 78.8,26.8 77.6)"
    # three LEADERs with empty/oversized/disabled arrowheads: line only
    assert [f["wkt"].split(" ")[0] for f in feats[13:16]] == ["LINESTRING"] * 3
    # spline LEADER: 5 control points -> 40 interpolated points
    sp = _pts(feats[35]["wkt"])
    assert sp.shape[0] == 40
    np.testing.assert_allclose(sp[0], [75.0, -5.0], atol=1e-12)
    np.testing.assert_allclose(
        sp[1], [75.3293039686015, -5.27450166567948], atol=1e-9
    )
    np.testing.assert_allclose(
        sp[26], [82.9452821800198, -12.1575745539156], atol=1e-9
    )
    np.testing.assert_allclose(sp[-1], [79.0, -16.0], atol=1e-12)


def test_dxf_44_mleader():
    """ogr_dxf_44 (MULTILEADER): 30x section state machine, dogleg +
    landing geometry, DIMBREAK gaps, custom arrowheads, spline leader
    lines, rotated/scaled block content organized into a polygon with
    holes, ATTDEF attribute substitution, and label points."""
    feats = parse_dxf(open(LEADERS, encoding="latin-1").read())

    def P(w):
        return _pts(w)

    # custom arrowhead MULTILEADER: line + dogleg, block content, label
    np.testing.assert_allclose(
        P(feats[9]["wkt"]),
        P("MULTILINESTRING ((26.8 32.6,10 20,25 10,25 5,40 20),"
          "(40 20,48 20))"), atol=1e-9,
    )
    assert feats[10]["Entity"] == "SOLID"
    assert feats[12]["Text"] == "Basic Multileader"
    np.testing.assert_allclose(
        P(feats[12]["wkt"])[0], [50.0, 22.0327421555252], atol=1e-9
    )
    # empty-block and too-large arrowheads suppressed
    assert feats[16]["wkt"].startswith("MULTILINESTRING")
    assert feats[17]["wkt"].startswith("POINT")
    assert feats[18]["wkt"].startswith("MULTILINESTRING")
    assert feats[19]["wkt"].startswith("POINT")
    # blue MULTILEADER with two leader lines + dogleg
    np.testing.assert_allclose(
        P(feats[20]["wkt"]),
        P("MULTILINESTRING ((7.6425115795681 -8.00285406769102,18.2 -20.0),"
          "(19.2913880067389 -13.9367332958948,18.2 -20.0),"
          "(18.2 -20.0,38 -20),"
          "(54.8204921137545 -22.5800753657327,60.2227692307692 -20.0),"
          "(60.2227692307692 -20.0,52.2227692307692 -20.0))"), atol=1e-9,
    )
    # rotated/scaled block content -> polygon with 4 holes; attribute text
    assert feats[25]["wkt"].startswith("POLYGON")
    assert feats[25]["wkt"].count("(") == 6
    np.testing.assert_allclose(
        P(feats[25]["wkt"])[0],
        [-40.7553616986189, -14.3661762772835], atol=1e-9,
    )
    assert feats[26]["Entity"] == "ATTDEF"
    assert feats[26]["Text"] == "Apples±"
    np.testing.assert_allclose(
        P(feats[26]["wkt"])[0],
        [-42.7597068401767, -14.5165110820149], atol=1e-9,
    )
    # no-dogleg MULTILEADER: both lines end at the dogleg point
    np.testing.assert_allclose(
        P(feats[27]["wkt"]),
        P("MULTILINESTRING ((-2.39659963256204 -14.5201521575302,"
          "-3.98423252456234 -23.1105237601191),"
          "(-26.0282877045921 -20.4748699216691,"
          "-3.98423252456233 -23.1105237601191))"), atol=1e-9,
    )
    # block-content-only MULTILEADER: empty MLS + organized polygon
    assert feats[32]["wkt"] == "MULTILINESTRING EMPTY"
    np.testing.assert_allclose(
        P(feats[33]["wkt"])[:5],
        P("POLYGON ((-4.98423252456234 -22.1105237601191,"
          "-6.98423252456234 -22.1105237601191,"
          "-6.98423252456234 -24.1105237601191,"
          "-4.98423252456234 -24.1105237601191,"
          "-4.98423252456234 -22.1105237601191))"), atol=1e-9,
    )
    # spline MULTILEADER: arrowhead moved start + 40-point splines
    sp = P(feats[36]["wkt"])
    np.testing.assert_allclose(
        sp[0], [97.9154085227223, -24.4884177083425], atol=1e-9
    )
    np.testing.assert_allclose(
        P(feats[37]["wkt"])[1], [96.0, -28.0], atol=1e-12
    )
    assert feats[38]["Text"] == "Splines"
    np.testing.assert_allclose(
        P(feats[38]["wkt"])[0], [110.7043505591, -4.20673403616296],
        atol=1e-9,
    )
    # DIMBREAK gaps split the MLS
    np.testing.assert_allclose(
        P(feats[39]["wkt"]),
        P("MULTILINESTRING ((50.8917622404846 41.5635728657296,"
          "51.2877903403879 42.2579494192141),"
          "(51.9070696740577 43.3437639093041,54.3108962133801"
          " 47.5585173269448,55.9270734326513 48.2521008552884),"
          "(57.0757636753042 48.7450620367561,59.4256548786735"
          " 49.7535194092661),(60 50,60 50),(60 50,60 50),"
          "(60.625 50.0,61.875 50.0),(63.125 50.0,63.6 50.0))"), atol=1e-9,
    )


ADDITIONAL = "/root/reference/autotest/ogr/data/dxf/additional-entities.dxf"


def test_dxf_52_mline():
    """ogr_dxf_52 (MLINE): element lines offset along the miter vector,
    pen-up/pen-down 41-parameters splitting segments, closed MLINEs
    joining back to the initial vertices."""
    feats = parse_dxf(open(ADDITIONAL, encoding="latin-1").read())
    ml = [f for f in feats if f["Entity"] == "MLINE"]
    assert len(ml) == 3
    np.testing.assert_allclose(
        _pts(ml[0]["wkt"]),
        _pts("MULTILINESTRING ((-3.92232270276368 270.388386486182,"
             "44.2014737139232 260.763627202844),(0 290,50 280),"
             "(50 280,54.2440667916678 280.848813358334),"
             "(66.6666666666666 283.333333333333,"
             "87.2937093466817 287.458741869336),"
             "(55.335512192016 260.671024384032,"
             "83.0445264186877 266.212827229366),"
             "(97.9166666666667 289.583333333333,150 300),"
             "(93.6674837386727 268.337418693363,"
             "122.93205511402 274.190332968433),(150 300,140 260),"
             "(122.93205511402 274.190332968433,"
             "120.597149997093 264.850712500727))"), atol=1e-9,
    )
    np.testing.assert_allclose(
        _pts(ml[1]["wkt"]),
        _pts("MULTILINESTRING ((70 290,50 250),(61.0557280900008"
             " 294.472135955,41.0557280900008 254.472135955))"), atol=1e-9,
    )
    # closed 3-element MLINE: 15 segments, joins back to initial verts
    assert ml[2]["wkt"].count("(") - 1 == 15
    np.testing.assert_allclose(
        _pts(ml[2]["wkt"])[:2],
        [[100, 300], [97.9166666666667, 289.583333333333]], atol=1e-9,
    )


def test_dxf_52_minsert_attrib():
    """ogr_dxf_52 (MInsert): INSERT with 4x2 rows/columns at 13 degrees,
    block content per cell plus ATTRIB text anchors shifted by the
    cell offset only."""
    feats = parse_dxf(open(ADDITIONAL, encoding="latin-1").read())
    ins = [f for f in feats if f["Entity"] == "INSERT"]
    att = [f for f in feats if f["Entity"] == "ATTRIB"]
    assert len(ins) == 8 and len(att) == 8
    np.testing.assert_allclose(
        _pts(ins[0]["wkt"]),
        _pts("LINESTRING (57.7504894565613 50.7437006478524,"
             "69.4429302339842 53.4431132999787,"
             "71.6924407774228 43.6994126521264,60 41,"
             "57.7504894565613 50.7437006478524)"), atol=1e-9,
    )
    assert att[0]["Text"] == "N"
    np.testing.assert_allclose(
        _pts(att[0]["wkt"])[0], [62.5032851270548, 42.604233016948],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        _pts(att[2]["wkt"])[0], [120.965489014169, 56.1012962775799],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        _pts(ins[7]["wkt"]),
        _pts("LINESTRING (140.944774200355 90.4766968345049,"
             "152.637214977778 93.1761094866313,"
             "154.886725521217 83.4324088387789,"
             "143.194284743794 80.7329961866526,"
             "140.944774200355 90.4766968345049)"), atol=1e-9,
    )
    np.testing.assert_allclose(
        _pts(att[7]["wkt"])[0], [145.697569870849, 82.3372292036006],
        atol=1e-9,
    )
    assert att[0]["SubClasses"] == "AcDbEntity:AcDbText:AcDbAttribute"


def test_dxf_53_block_basepoint():
    """ogr_dxf_53: block base point shifts block content by -(base)."""
    feats = parse_dxf(
        open("/root/reference/autotest/ogr/data/dxf/block-basepoint.dxf",
             encoding="latin-1").read()
    )
    np.testing.assert_allclose(
        _pts(feats[0]["wkt"]),
        _pts("MULTILINESTRING ((290 160,310 140),(310 160,290 140))"),
        atol=1e-12,
    )


def test_dxf_9_dimension_feature_order():
    """assorted.dxf FID alignment: three DIMENSIONs at features 7-18
    (each MLS + 2 arrowheads + label), merged INSERT at 19."""
    feats = _feats()
    assert [f["Entity"] for f in feats[7:19]] == ["DIMENSION"] * 12
    assert feats[19]["Entity"] == "INSERT"
    assert feats[10]["wkt"].startswith("POINT")
    assert feats[7]["wkt"].startswith("MULTILINESTRING")


def test_arc_angles_circle_closure():
    pts = approximate_arc_angles(10, 20, 0, 5, 5, 0, 0, 360)
    assert pts[0] == pts[-1]
    r = np.hypot(
        np.array([p[0] for p in pts]) - 10, np.array([p[1] for p in pts]) - 20
    )
    assert np.allclose(r, 5.0)
    # 4-degree default step: ceil(360/4)+1 = 91 vertex count, full-circle
    # decrement to 90 unique points, +1 closing point (:4839-4841,4916-4920)
    assert len(pts) == 91


DXF_DIR = "/root/reference/autotest/ogr/data/dxf"


def _spline_wkts(name):
    feats = parse_dxf(
        open(f"{DXF_DIR}/{name}.dxf", encoding="latin-1").read()
    )
    return [f["wkt"] for f in feats if f["Entity"] == "SPLINE"]


def test_dxf_20_spline_qcad():
    # autotest ogr_dxf.py test 20 expected LINESTRING, first/mid/last
    # vertices pinned to the reference's printed precision
    (wkt,) = _spline_wkts("spline_qcad")
    p = _pts(wkt)
    assert p.shape[0] == 64  # 8 control points * 8
    np.testing.assert_allclose(p[0], [10.75, 62.75], atol=1e-12)
    np.testing.assert_allclose(
        p[1], [20.6377527691461, 63.4348325014897], atol=1e-10
    )
    np.testing.assert_allclose(
        p[30], [70.6722726127488, 9.40541428211496], atol=1e-10
    )
    np.testing.assert_allclose(p[-1], [57.25, 85.5], atol=1e-10)


def test_dxf_29_spline_weights():
    # autotest test 29: same control polygon, three weight settings
    w1, w2, w05 = _spline_wkts("spline_weight")
    for wkt in (w1, w2, w05):
        p = _pts(wkt)
        assert p.shape[0] == 40
        np.testing.assert_allclose(p[0], [2, 2], atol=1e-12)
        np.testing.assert_allclose(p[-1], [6, 2], atol=1e-10)
    np.testing.assert_allclose(
        _pts(w1)[13], [3.33333333333333, 3.7037037037037], atol=1e-10
    )
    np.testing.assert_allclose(
        _pts(w2)[13], [3.51351351351351, 4.05405405405405], atol=1e-10
    )
    np.testing.assert_allclose(
        _pts(w05)[13], [3.18181818181818, 3.40909090909091], atol=1e-10
    )


def test_dxf_30_spline_closed_recalc_knots():
    # autotest test 30: closed spline; explicit-knot and
    # recalculate-knots variants must produce the identical curve
    a, b = _spline_wkts("spline_closed")
    pa, pb = _pts(a), _pts(b)
    assert pa.shape[0] == 56
    np.testing.assert_allclose(pa, pb, atol=1e-12)
    np.testing.assert_allclose(pa[0], [14, 2], atol=1e-12)
    np.testing.assert_allclose(
        pa[20], [14.8931253533123, 4.37659666021141], atol=1e-10
    )
    np.testing.assert_allclose(pa[-1], [14, 2], atol=1e-10)


def test_dxf_spline_negative_knot_snap():
    # github #1969 fixture: first knot at -1e-300-ish must snap to 0
    (wkt,) = _spline_wkts("spline_with_very_close_neg_to_zero_knot")
    p = _pts(wkt)
    assert p.shape[0] >= 16
    assert np.isfinite(p).all()


def _hatch_wkts(name, step=4.0):
    feats = parse_dxf(
        open(f"{DXF_DIR}/{name}.dxf", encoding="latin-1").read(),
        arc_step=step,
    )
    return [f["wkt"] for f in feats if f["Entity"] == "HATCH"]


def test_dxf_24_hatch_arcs():
    # autotest test 24 (OGR_ARC_STEPSIZE=45): circular-arc boundary
    # edges (cw + ccw) and a line-edge triangle
    h1, h2, h3 = _hatch_wkts("hatch", step=45.0)
    p1 = _pts(h1)
    assert h1.startswith("POLYGON")
    np.testing.assert_allclose(p1[0], [2, 1], atol=1e-12)
    np.testing.assert_allclose(
        p1[1], [1.646446609406726, 0.853553390593274], atol=1e-10
    )
    assert p1.shape[0] == 17
    coords = [
        [float(t) for t in pair.split()[:2]]
        for pair in h2.strip("POLYGON ()").split(",")
    ]
    np.testing.assert_allclose(coords[0], [0, 0], atol=1e-12)
    np.testing.assert_allclose(
        coords[1], [-0.353553390593274, 0.146446609406726], atol=1e-10
    )
    assert "POLYGON" in h3
    tri = _pts(h3)[:, :2] if _pts(h3).shape[1] == 2 else _pts(h3)
    np.testing.assert_allclose(
        _pts(h3).reshape(-1)[:2], [-1, -1], atol=1e-12
    )


def test_dxf_hatch_as_multipolygon():
    # disjoint/overlapping polyline-loop hatches stay separate shells
    (wkt,) = _hatch_wkts("hatch_as_multipolygon")
    assert wkt.startswith("MULTIPOLYGON")
    import re as _re

    shells = _re.findall(r"\(\(([^)]*)\)", wkt)
    assert len(shells) == 5
    p = _pts(wkt)
    np.testing.assert_allclose(
        p[0], [358.626489135389, -3222.17795096722], atol=1e-9
    )
    np.testing.assert_allclose(
        p[-1], [443.941789741891, -3157.62648135038], atol=1e-9
    )


def test_dxf_35_hatch_elliptical_arc():
    # autotest test 35: elliptical-arc edge with the circular-angle ->
    # elliptical-parameter transform
    wkt = _hatch_wkts("elliptical-arc-hatch-min")[0]
    p = _pts(wkt)
    np.testing.assert_allclose(p[0], [10.0, 5.0], atol=1e-9)
    np.testing.assert_allclose(
        p[1], [10.0121275732481, 0.823574944937595], atol=1e-9
    )


def test_dxf_25_3dface():
    feats = parse_dxf(open(f"{DXF_DIR}/3dface.dxf", encoding="latin-1").read())
    assert feats[0]["wkt"] == "POLYGON ((10 20 30,11 21 31,12 22 32,10 20 30))"
    assert feats[1]["wkt"] == (
        "POLYGON ((10 20 30,11 21 31,12 22 32,13 23 33,10 20 30))"
    )


def test_dxf_26_solid_ocs():
    # autotest test 26 (#5380): SOLID under a (0,0,-1) extrusion — the
    # OCS arbitrary-axis transform must flip x
    feats = parse_dxf(open(f"{DXF_DIR}/solid.dxf", encoding="latin-1").read())
    assert feats[0]["wkt"] == (
        "POLYGON ((2.716846 2.762514,2.393674 1.647962,4.391042 1.06881,"
        "4.714214 2.183362,2.716846 2.762514))"
    )


def test_dxf_read_wipeout():
    # autotest #11022: boundary vertices mapped through the insertion
    # point + u/v scales; ignored entities (VIEWPORT) emit no feature
    feats = parse_dxf(open(f"{DXF_DIR}/wipeout.dxf", encoding="latin-1").read())
    # the WIPEOUTs sit inside INSERTed blocks: merged-block mode emits
    # them as the INSERT features (geometry golden unchanged)
    assert [f["Entity"] for f in feats] == ["INSERT", "INSERT"]
    p = _pts(feats[0]["wkt"])
    np.testing.assert_allclose(
        p[0], [448381.028869725, 6913933.17804321], atol=1e-7
    )
    np.testing.assert_allclose(
        p[2], [448380.807997101, 6913933.38119118], atol=1e-7
    )
    assert p.shape[0] == 7


def test_read_dxf_distributed(spark):
    df = read_dxf(spark, [ASSORTED])
    rows = df.orderBy("fid").collect()
    assert len(rows) == 22
    assert rows[2].wkt == "POINT (83.5 160)"
    assert rows[0].fields["EntityHandle"] == "43"


# ---------------------------------------------------------------------------
# OGR_STYLE strings (PrepareLineStyle / PrepareBrushStyle /
# PrepareFeatureStyle, ogrdxflayer.cpp:248-530; GetColor,
# ogrdxf_feature.cpp:136-401; ACAdjustText, ogr_autocad_services.cpp)
# ---------------------------------------------------------------------------


def _styles(name, **kw):
    return [
        f.get("Style")
        for f in parse_dxf(
            open(f"{DXF_DIR}/{name}.dxf", encoding="latin-1").read(), **kw
        )
    ]


def test_dxf_styles_assorted():
    # autotest ogr_dxf.py:89,162,203,300 goldens
    st = _styles("assorted")
    assert st[0] == "PEN(c:#000000)"
    assert st[2] == "PEN(c:#ffbeb8)"
    assert st[4] == 'LABEL(f:"Arial",t:"Test",a:30,s:5g,p:7,c:#000000)'
    assert st[10] == 'LABEL(f:"Arial",t:"54.33",p:5,a:43.3,s:2.5g,c:#000000)'
    assert st[8] == "BRUSH(fc:#000000)"  # dimension arrowhead


def test_dxf_styles_hatch_patterns():
    # autotest test_ogr_dxf_hatch_pattern_read golden list
    assert _styles("hatch_pattern_generated_by_gdal") == [
        "BRUSH(fc:#ff00ff)",
        'BRUSH(fc:#ff0000,bc:#7f7f7f,id:"ogr-brush-7")',
        'BRUSH(fc:#ff0000,bc:#0000ff,id:"ogr-brush-6")',
        'BRUSH(fc:#00ff00,bc:#123456,id:"ogr-brush-5")',
        'BRUSH(fc:#ff0000,bc:#00ff00,id:"ogr-brush-4")',
        'BRUSH(fc:#ffff00,bc:#123456,id:"ogr-brush-3")',
        'BRUSH(fc:#ff0000,bc:#0080ff,id:"ogr-brush-2",s:0.500000)',
    ]


def test_dxf_styles_linetypes():
    # autotest ogr_dxf_45: LTYPE dash patterns scaled by LinetypeScale
    assert _styles("linetypes")[:4] == [
        'PEN(c:#000000,p:"12.5g 6.25g")',
        'PEN(c:#000000,p:"0.625g 0.3125g")',
        'PEN(c:#000000,p:"0.625g 0.3125g")',
        'PEN(c:#000000,p:"35g 22.5g")',
    ]


def test_dxf_styles_text_fancy():
    # autotest ogr_dxf_50: extended text styling + ByBlock/ByLayer (#7151,
    # #7130) — font/bold/italic/width from the STYLE table, ByBlock
    # lineweight/linetype inheritance, invisible entity alpha
    assert _styles("text-fancy", merge_blocks=False)[:6] == [
        'LABEL(f:"Times New Roman",bo:1,it:1,t:"Some nice text",p:5,'
        's:10g,w:190,dx:84.3151g,dy:4.88825g,c:#0000ff)',
        'PEN(c:#ff0000,w:2.1g,p:"2.5g 1.25g")',
        'LABEL(f:"Times New Roman",bo:1,it:1,t:"Good text",p:1,s:5g,'
        'c:#000000)',
        "PEN(c:#0000ff,w:2.1g)",
        'LABEL(f:"Times New Roman",bo:1,it:1,t:"Some nice MTEXT",s:10g,'
        'w:250,p:8,c:#0000ff)',
        'LABEL(f:"Times New Roman",bo:1,it:1,t:"Invisible text",p:1,s:5g,'
        'c:#00000000)',
    ]


def test_dxf_styles_block_transform():
    # autotest ogr_dxf_51: ACAdjustText angle/scale/offset surgery
    want = sorted(
        ["a:330", "c:#000000", "dx:1.96672g", "dy:-1.13549g", 'f:"Arial"',
         "p:2", "s:3g", 't:"some text"', "w:25"]
    )
    for st in _styles("text-block-transform")[:3]:
        assert sorted(st[6:-1].split(",")) == want


def test_dxf_styles_leader_mleader():
    # autotest ogr_dxf_44 style assertions
    st = _styles("leader-mleader")
    assert st[3] == "PEN(c:#ff0000)"
    assert st[4] == "BRUSH(fc:#ff0000)"
    assert st[5] == "PEN(c:#00ff00)"
    assert st[6] == "BRUSH(fc:#00ff00)"
    assert st[7] == "PEN(c:#00ff00)"
    assert st[12] == 'LABEL(f:"Arial",t:"Basic Multileader",p:7,s:4g,c:#000000)'
    assert st[20] == "PEN(c:#0000ff)"
    assert st[21] == "BRUSH(fc:#0000ff)"
    assert st[22] == "BRUSH(fc:#0000ff)"
    assert st[23].startswith('LABEL(f:"Calibri",it:1,t:"wwmhyhua')
    assert st[23].endswith('",p:7,s:4g,w:40,c:#0000ff)')
    assert st[24] == "PEN(c:#ff00ff)"
    # block-attribute label restyled + ACAdjustText'd (a: appended last)
    assert st[26] == 'LABEL(f:"Arial",t:"Apples±",p:2,s:1g,c:#ff0000,a:10)'
    assert st[38] == 'LABEL(f:"Arial",t:"Splines",p:7,a:342,s:2g,c:#000000)'


def test_dxf_styles_transparency_and_attrib():
    # autotest test_ogr_dxf_read_transparency + ogr_dxf_49 nested attrib
    assert _styles("transparency")[0] == "PEN(c:#ffbeb87f)"
    assert _styles("attrib-nested", merge_blocks=False) == [
        'LABEL(f:"Arial",t:"Gamma Goochee",p:1,s:0.4g,w:100,c:#000000)'
    ]


def test_dxf_styles_minsert_attribs():
    # autotest ogr_dxf_52 MInsert attribute style (8 copies)
    got = [
        f.get("Style")
        for f in parse_dxf(
            open(f"{DXF_DIR}/additional-entities.dxf",
                 encoding="latin-1").read()
        )
        if f.get("Entity") == "ATTRIB"
    ]
    assert len(got) == 8
    assert set(got) == {
        'LABEL(f:"Arial",t:"N",p:5,a:13,s:8g,w:120,dx:2.21818g,'
        'dy:4.61732g,c:#000000)'
    }


_FROZEN_VIS = (
    ".hhh..hhh..hhhhhhhhhhhhhh.hhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhhh"
    "hhhhhhhhhhhhhhhhhh.hhh..hhhhhhhhhhhhhh.hhh"
)


@pytest.mark.parametrize("freeze_layer0", [False, True])
def test_dxf_styles_frozen_off_ladder(freeze_layer0):
    # autotest ogr_dxf_53: ON/OFF/THAW/FREEZE visibility of entities and
    # nested block contents (DEMOBLOCK references DEMOBLOCKWITHSUB,
    # which is defined LATER in the BLOCKS section — exercises the
    # forward-reference fixpoint re-pass)
    txt = open(f"{DXF_DIR}/frozen-off.dxf", encoding="latin-1").read()
    if freeze_layer0:
        txt = txt.replace(
            "0\nLAYER\n  2\n0\n 70\n     0", "0\nLAYER\n  2\n0\n 70\n     1"
        )
    feats = parse_dxf(txt, merge_blocks=False)
    assert len(feats) == len(_FROZEN_VIS)
    for n, (f, h) in enumerate(zip(feats, _FROZEN_VIS)):
        s = f.get("Style") or ""
        visible = "#000000)" in s or "#ff0000)" in s
        assert visible != (h == "h"), f"feature {n}"


def test_dxf_styles_byblock_bylayer_ladder():
    # autotest ogr_dxf_54a: 819-feature color ladder over two levels of
    # nested blocks with ByBlock / set / ByLayer colors on three layers
    colors = (
        "77727127527472412452477271275271121121521412412452"
        "47127127527552512552545241245247527127527377271275"
        "27472412452437231235231121121521412412452431231235"
        "23552512552545241245243523123523777271275274724124"
        "52477271275271121121521412412452471271275275525125"
        "52545241245247527127527111211215214124124524112112"
        "15211121121521412412452411211215215525125525452412"
        "45241521121521311211215214124124524312312352311211"
        "21521412412452431231235235525125525452412452435231"
        "23523711211215214124124524712712752711211215214124"
        "12452471271275275525125525452412452475271275275552"
        "51255254524124524552512552511211215214124124524512"
        "51255255525125525452412452455251255253552512552545"
        "24124524352312352311211215214124124524312312352355"
        "25125525452412452435231235237552512552545241245247"
        "52712752711211215214124124524712712752755251255254"
        "5241245247527127527"
    )
    cdict = {"#ff0000": "1", "#ffff00": "2", "#00ff00": "3",
             "#00ffff": "4", "#0000ff": "5", "#000000": "7"}
    feats = parse_dxf(
        open(f"{DXF_DIR}/byblock-bylayer-new.dxf",
             encoding="latin-1").read(),
        merge_blocks=False,
    )
    assert len(feats) == len(colors)
    for n, (f, e) in enumerate(zip(feats, colors)):
        m = re.search("c:(#......)", f.get("Style") or "")
        assert m and cdict.get(m.group(1)) == e, f"feature {n}"


def test_dxf_styles_block_hidden_entities():
    # autotest ogr_dxf_55: hidden (60=1) entities in blocks get alpha 00
    st = _styles("block-hidden-entities", merge_blocks=False)
    assert len(st) == 6
    assert all("#ff000000)" in s or "#000000)" in s for s in st)
