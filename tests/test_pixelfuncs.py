"""VRT pixel-function registry vs straightforward numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import pixelfuncs as PF

rng = np.random.default_rng(2)
A = rng.random((6, 7)) * 100 + 1
B = rng.random((6, 7)) * 100 + 1
C = rng.random((6, 7)) * 100 + 1


@pytest.mark.parametrize(
    "name,bands,kwargs,expect",
    [
        ("sum", [A, B, C], {}, A + B + C),
        ("sum", [A, B], {"k": 5.0}, A + B + 5.0),
        ("diff", [A, B], {}, A - B),
        ("mul", [A, B], {}, A * B),
        ("div", [A, B], {}, A / B),
        ("min", [A, B, C], {}, np.minimum(np.minimum(A, B), C)),
        ("max", [A, B, C], {}, np.maximum(np.maximum(A, B), C)),
        ("norm_diff", [A, B], {}, (A - B) / (A + B)),
        ("intensity", [A], {}, A * A),
        ("sqrt", [A], {}, np.sqrt(A)),
        ("log10", [A], {}, np.log10(A)),
        ("dB", [A], {"fact": 10.0}, 10.0 * np.log10(A)),
        ("exp", [A], {"base": 2.0, "fact": 0.01}, 2.0 ** (0.01 * A)),
        ("pow", [A], {"power": 2.5}, A ** 2.5),
        ("scale", [A], {"offset": 3.0, "scale": 0.5}, 3.0 + 0.5 * A),
        ("mean", [A, B, C], {}, (A + B + C) / 3),
        ("median", [A, B, C], {}, np.median(np.stack([A, B, C]), axis=0)),
        ("geometric_mean", [A, B], {}, np.sqrt(A * B)),
        ("harmonic_mean", [A, B], {}, 2.0 / (1.0 / A + 1.0 / B)),
        ("expression", [A, B], {"expr": "(B1 + B2) / 2"}, (A + B) / 2),
    ],
)
def test_registry_matches_numpy(name, bands, kwargs, expect):
    got = PF.apply_named(name, bands, **kwargs)
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_div_by_zero_yields_zero():
    z = np.zeros((2, 2))
    out = PF.apply_named("div", [np.ones((2, 2)), z])
    assert (out == 0).all()
    nd = PF.apply_named("norm_diff", [z, z])
    assert (nd == 0).all()


def test_mode_and_reclassify():
    a = np.array([[1.0, 2.0], [2.0, 3.0]])
    b = np.array([[1.0, 5.0], [2.0, 4.0]])
    c = np.array([[9.0, 5.0], [7.0, 3.0]])
    m = PF.apply_named("mode", [a, b, c])
    assert m[0, 0] == 1.0 and m[0, 1] == 5.0 and m[1, 0] == 2.0
    r = PF.apply_named("reclassify", [a], mapping={1.0: 10.0, 3.0: 30.0})
    np.testing.assert_array_equal(r, [[10.0, 2.0], [2.0, 30.0]])
    rd = PF.apply_named("reclassify", [a], mapping={2.0: 20.0}, default=-1.0)
    np.testing.assert_array_equal(rd, [[-1.0, 20.0], [20.0, -1.0]])


def test_replace_nodata():
    a = np.array([[1.0, np.nan], [-999.0, 4.0]])
    out = PF.apply_named("replace_nodata", [a], to=0.0)
    np.testing.assert_array_equal(out, [[1.0, 0.0], [-999.0, 4.0]])
    out2 = PF.apply_named("replace_nodata", [a], to=7.0, nodata=-999.0)
    assert out2[1, 0] == 7.0


def test_interpolate_linear():
    b0 = np.zeros((2, 2))
    b1 = np.full((2, 2), 10.0)
    mid = PF.apply_named("interpolate_linear", [b0, b1], t0=0.0, dt=1.0, t=0.5)
    np.testing.assert_allclose(mid, 5.0)
    at1 = PF.apply_named("interpolate_linear", [b0, b1], t0=0.0, dt=1.0, t=1.0)
    np.testing.assert_allclose(at1, 10.0)


def test_expression_allowlisted_funcs():
    a = np.array([[1.0, 4.0], [9.0, 16.0]])
    out = PF.apply_named("expression", [a], expr="sqrt(B1) * 2")
    np.testing.assert_allclose(out, np.sqrt(a) * 2)
    out2 = PF.apply_named("expression", [a, a], expr="where(B1 > 4, B1, B2 / 2)")
    np.testing.assert_allclose(out2, np.where(a > 4, a, a / 2))
    out3 = PF.apply_named("expression", [a], expr="clip(B1, 2, 10)")
    np.testing.assert_allclose(out3, np.clip(a, 2, 10))


def test_expression_rejects_code_exec_surface():
    import pytest

    a = np.array([[1.0]])
    hostile = [
        "().__class__.__mro__[1].__subclasses__()",  # attribute escape
        "B1.__class__",                              # dunder attribute
        "getattr(B1, 'dtype')",                      # non-allowlisted call
        "[x for x in (1,)][0]",                      # comprehension
        "(lambda: 1)()",                             # lambda
        "B1[0]",                                     # subscript
        "__import__('os')",                          # import
        "'abc'",                                     # non-numeric constant
        "np.sqrt(B1)",                               # attribute access on np
        "unknown_name + 1",                          # name smuggling
        "sqrt(B1, out=B1)",                          # kwargs
    ]
    for expr in hostile:
        with pytest.raises((ValueError, SyntaxError)):
            PF.apply_named("expression", [a], expr=expr)
